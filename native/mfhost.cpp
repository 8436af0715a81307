// mfhost: native host-side helpers for the frame-assembly and audio hot paths.
//
// The reference's per-frame host work (PCM conversion in every engine's
// process_frames, lipreal.py:219-221, and the feathered blend in
// musetalk/utils/blending.py:103-125) runs on the Python side at 25 fps per
// session; these loops are the per-session host cost that bounds
// multi-session scale-out, so they are implemented natively here and loaded
// via ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmfhost.so mfhost.cpp
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>

extern "C" {

// float32 [-1,1] -> int16 PCM with clipping
void f32_to_pcm16(const float* in, int16_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
        out[i] = (int16_t)lrintf(v * 32767.0f);
    }
}

// int16 PCM -> float32 [-1,1]
void pcm16_to_f32(const int16_t* in, float* out, int64_t n) {
    const float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * k;
}

// linear-interpolation resampler (fallback path; polyphase lives in scipy)
void resample_linear(const float* in, int64_t n_in, float* out, int64_t n_out) {
    if (n_in <= 1 || n_out <= 0) return;
    const double step = (double)(n_in - 1) / (double)(n_out - 1 > 0 ? n_out - 1 : 1);
    for (int64_t i = 0; i < n_out; ++i) {
        double pos = i * step;
        int64_t j = (int64_t)pos;
        if (j >= n_in - 1) j = n_in - 2;
        float frac = (float)(pos - j);
        out[i] = in[j] * (1.0f - frac) + in[j + 1] * frac;
    }
}

// out = fg * w + bg * (1 - w), all uint8 HxWx3, w float HxW in [0,1]
void blend_linear_u8(const uint8_t* fg, const uint8_t* bg, const float* w,
                     uint8_t* out, int64_t h, int64_t width, int64_t c) {
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* fr = fg + y * width * c;
        const uint8_t* br = bg + y * width * c;
        const float* wr = w + y * width;
        uint8_t* orow = out + y * width * c;
        for (int64_t x = 0; x < width; ++x) {
            float a = wr[x];
            float ia = 1.0f - a;
            for (int64_t k = 0; k < c; ++k) {
                float v = fr[x * c + k] * a + br[x * c + k] * ia;
                orow[x * c + k] = (uint8_t)(v + 0.5f);
            }
        }
    }
}

// copy src (sh x sw x 3) into dst (dh x dw x 3) at (y, x) — bbox paste
void paste_u8(const uint8_t* src, uint8_t* dst, int64_t sh, int64_t sw,
              int64_t dh, int64_t dw, int64_t y, int64_t x, int64_t c) {
    for (int64_t r = 0; r < sh; ++r) {
        int64_t dy = y + r;
        if (dy < 0 || dy >= dh) continue;
        int64_t x0 = std::max<int64_t>(0, x);
        int64_t x1 = std::min<int64_t>(dw, x + sw);
        if (x1 <= x0) continue;
        std::memcpy(dst + (dy * dw + x0) * c,
                    src + (r * sw + (x0 - x)) * c,
                    (size_t)((x1 - x0) * c));
    }
}

// single-producer single-consumer float ring buffer
struct RingF32 {
    float* data;
    int64_t capacity;
    int64_t head;  // written
    int64_t tail;  // read
};

RingF32* ring_create(int64_t capacity) {
    RingF32* r = new RingF32();
    r->data = new float[capacity];
    r->capacity = capacity;
    r->head = 0;
    r->tail = 0;
    return r;
}

void ring_destroy(RingF32* r) {
    delete[] r->data;
    delete r;
}

int64_t ring_size(const RingF32* r) { return r->head - r->tail; }

int64_t ring_push(RingF32* r, const float* items, int64_t n) {
    int64_t space = r->capacity - (r->head - r->tail);
    int64_t k = std::min(n, space);
    for (int64_t i = 0; i < k; ++i)
        r->data[(r->head + i) % r->capacity] = items[i];
    r->head += k;
    return k;
}

int64_t ring_pop(RingF32* r, float* out, int64_t n) {
    int64_t avail = r->head - r->tail;
    int64_t k = std::min(n, avail);
    for (int64_t i = 0; i < k; ++i)
        out[i] = r->data[(r->tail + i) % r->capacity];
    r->tail += k;
    return k;
}

}  // extern "C"
