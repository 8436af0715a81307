"""Differentiable renderers + photometric 3DMM pose refinement.

The reference refines BFM id/exp/pose by differentiable *rendering*: a
pytorch3d mesh rasterizer with per-vertex textures drives a photometric loss
against the video frames (reference: data_utils/face_tracking/render_3dmm.py:1-25,
face_tracker.py photometric stage). pytorch3d has no TPU story, so two
JAX-native renderers live here:

- **soft mesh rasterizer** (``render_mesh_soft`` / supersampled
  ``render_mesh_ss``) — the pytorch3d-equivalent path when triangle topology
  is available: gradient-free top-K face selection (``rasterize_topk``,
  pytorch3d's faces_per_pixel) followed by differentiable shading of only
  the selected faces with a sigmoid boundary skirt and a softmax z-buffer
  (softmax_rgb_blend). O(pixels · K) backward, occlusion-correct.
- **Gaussian point splat** (``render_splat``) — the topology-free fallback:
  each vertex scatter-adds a Gaussian footprint with a soft inverse-depth
  weight.

``refine_photometric`` starts from the landmark fit
(tools/face_tracking.fit_landmarks) and descends a photometric loss over all
frames jointly. The mesh path optimizes per-frame euler/trans/exp plus
shared id/focal (regularized, like the reference) with blur-annealed
Levenberg–Marquardt; the splat path optimizes pose (+ albedo) with Adam.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.tools.face_tracking import (
    MorphableModel,
    euler_to_rot,
    project,
)


def render_splat(
    points_cam: jnp.ndarray,   # [N, 3] camera-space vertices (camera at -z)
    colors: jnp.ndarray,       # [N, 3] per-vertex albedo in [0, 1]
    focal: jnp.ndarray,
    center: tuple,
    hw: tuple,
    radius: int = 2,
    sigma: float = 1.0,
    depth_beta: float = 30.0,
):
    """Soft point-splat render → (rgb [H,W,3], coverage [H,W]).

    coverage is the accumulated splat weight; pixels with ~zero coverage
    hold the background (black) and should be masked out of photometric
    losses via coverage/(coverage+eps)."""
    h, w = hw
    uv = project(points_cam, focal, center)               # [N, 2]
    z = jnp.maximum(-points_cam[..., 2], 1e-4)
    zn = (z - z.min()) / (z.max() - z.min() + 1e-6)
    zw = jnp.exp(-depth_beta * zn)                        # nearer ⇒ heavier

    acc_rgb = jnp.zeros((h * w, 3))
    acc_w = jnp.zeros((h * w,))
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    inv2s2 = 1.0 / (2.0 * sigma * sigma)
    for du in range(-radius, radius + 1):
        for dv in range(-radius, radius + 1):
            pu = u0 + du
            pv = v0 + dv
            d2 = (u - pu) ** 2 + (v - pv) ** 2
            wgt = jnp.exp(-d2 * inv2s2) * zw
            inside = (pu >= 0) & (pu < w) & (pv >= 0) & (pv < h)
            wgt = jnp.where(inside, wgt, 0.0)
            idx = (jnp.clip(pv, 0, h - 1) * w
                   + jnp.clip(pu, 0, w - 1)).astype(jnp.int32)
            acc_rgb = acc_rgb.at[idx].add(wgt[:, None] * colors)
            acc_w = acc_w.at[idx].add(wgt)
    rgb = acc_rgb / (acc_w[:, None] + 1e-6)
    return rgb.reshape(h, w, 3), acc_w.reshape(h, w)


def _tri_geometry(a, b, c, pix):
    """Edge values / signed boundary distance / barycentrics of pixel(s)
    ``pix`` against triangle(s) (a, b, c). Shapes broadcast: [..., 2] each.

    Returns (d, b0, b1, b2, live): d = signed pixel distance to the triangle
    boundary (positive inside, the min over edges of edge_value/edge_length);
    b* = clipped + renormalized barycentrics; live = non-degenerate mask."""

    def edge_fn(p0, p1, q):
        return ((q[..., 0] - p0[..., 0]) * (p1[..., 1] - p0[..., 1])
                - (q[..., 1] - p0[..., 1]) * (p1[..., 0] - p0[..., 0]))

    w0 = edge_fn(b, c, pix)
    w1 = edge_fn(c, a, pix)
    w2 = edge_fn(a, b, pix)
    area = edge_fn(b, c, a)                       # twice signed area
    s = jnp.sign(area)
    s = jnp.where(s == 0, 1.0, s)
    area_abs = jnp.abs(area)
    live = (area_abs > 1e-8).astype(jnp.float32)
    w0, w1, w2 = w0 * s, w1 * s, w2 * s           # now: positive inside
    area_safe = jnp.maximum(area_abs, 1e-8)

    def elen(p0, p1):
        return jnp.sqrt(((p1 - p0) ** 2).sum(-1) + 1e-12)

    d = jnp.minimum(
        jnp.minimum(w0 / elen(b, c), w1 / elen(c, a)), w2 / elen(a, b))
    b0 = jnp.maximum(w0 / area_safe, 0.0)
    b1 = jnp.maximum(w1 / area_safe, 0.0)
    b2 = jnp.maximum(w2 / area_safe, 0.0)
    norm = b0 + b1 + b2 + 1e-8
    return d, b0 / norm, b1 / norm, b2 / norm, live


def rasterize_topk(
    uv: jnp.ndarray,       # [N, 2] projected vertices (pixels)
    z_norm: jnp.ndarray,   # [N] normalized nearness (1 = nearest)
    faces: jnp.ndarray,    # [T, 3]
    hw: tuple,
    d_max: float,
    chunk: int = 256,
    k: int = 2,
) -> jnp.ndarray:
    """Non-differentiable top-K rasterization → [P, K] face ids (-1 = none).

    The selection half of pytorch3d's MeshRasterizer with faces_per_pixel=K
    (reference: data_utils/face_tracking/render_3dmm.py:134-139 rasterizes
    with faces_per_pixel=2 and a blur_radius skirt): per pixel, the K nearest
    faces whose soft boundary comes within ``d_max`` pixels. Face *selection*
    carries no gradient in pytorch3d either — only the shading of the
    selected faces does — so this pass runs on stop_gradient'ed geometry and
    costs no AD residuals.
    """
    h, w = hw
    p = h * w
    uv = jax.lax.stop_gradient(uv)
    z_norm = jax.lax.stop_gradient(z_norm)
    t = faces.shape[0]
    pad = (-t) % chunk
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)]) if pad else faces
    tri_chunks = faces_p.reshape(-1, chunk, 3)
    bases = jnp.arange(tri_chunks.shape[0], dtype=jnp.int32) * chunk
    pix = jnp.stack(
        jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                     jnp.arange(h, dtype=jnp.float32)), -1
    ).reshape(p, 2)

    def body(carry, xs):
        best_z, best_f = carry                     # [K, P] (z: -inf = empty)
        tri, base = xs
        v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
        a, b, c = uv[v0, None], uv[v1, None], uv[v2, None]   # [C, 1, 2]
        d, b0, b1, b2, live = _tri_geometry(a, b, c, pix[None])  # [C, P]
        zp = (b0 * z_norm[v0, None] + b1 * z_norm[v1, None]
              + b2 * z_norm[v2, None])
        # rank: COVERING faces (d ≥ 0) strictly above skirt-only candidates
        # (+2 dominates z_norm ∈ [0,1]), nearest first within each class —
        # pytorch3d's blur_radius is sub-pixel (render_3dmm.py:137: ~5e-5
        # NDC), so its per-pixel face list is covering-faces-by-depth too;
        # ranking by nearness alone lets adjacent, slightly-nearer skirt
        # faces evict the covering face once triangles shrink to ~pixel
        # scale, which starves the barycentric texture gradient
        cand = (d > -d_max) & (live > 0)
        zc = jnp.where(cand, zp + 2.0 * (d >= 0), -jnp.inf)
        fc = base + jnp.arange(tri.shape[0], dtype=jnp.int32)

        # chunk top-K (nearest = largest z_norm), then merge with the carry
        cz, cf = [], []
        for _ in range(k):
            row = jnp.argmax(zc, axis=0)                       # [P]
            cz.append(jnp.take_along_axis(zc, row[None], 0)[0])
            cf.append(fc[row])
            zc = jnp.where(jnp.arange(zc.shape[0])[:, None] == row[None],
                           -jnp.inf, zc)
        mz = jnp.concatenate([best_z, jnp.stack(cz)])          # [2K, P]
        mf = jnp.concatenate([best_f, jnp.stack(cf)])
        nz, nf = [], []
        for _ in range(k):
            row = jnp.argmax(mz, axis=0)
            nz.append(jnp.take_along_axis(mz, row[None], 0)[0])
            nf.append(jnp.take_along_axis(mf, row[None], 0)[0])
            mz = jnp.where(jnp.arange(mz.shape[0])[:, None] == row[None],
                           -jnp.inf, mz)
        return (jnp.stack(nz), jnp.stack(nf)), None

    init = (jnp.full((k, p), -jnp.inf),
            jnp.full((k, p), -1, jnp.int32))
    (best_z, best_f), _ = jax.lax.scan(body, init, (tri_chunks, bases))
    return jnp.where(jnp.isfinite(best_z), best_f, -1).T      # [P, K]


def render_mesh_soft(
    points_cam: jnp.ndarray,   # [N, 3] camera-space vertices (camera at -z)
    faces: jnp.ndarray,        # [T, 3] int vertex indices
    colors: jnp.ndarray,       # [N, 3] per-vertex albedo in [0, 1]
    focal: jnp.ndarray,
    center: tuple,
    hw: tuple,
    sigma_px: float = 0.7,
    gamma: float = 0.03,
    chunk: int = 256,
    faces_per_pixel: int = 2,
):
    """Differentiable soft triangle rasterization → (rgb [H,W,3], cov [H,W]).

    The JAX twin of the reference's pytorch3d soft renderer
    (data_utils/face_tracking/render_3dmm.py:96-160: MeshRasterizer with
    faces_per_pixel=2 + softmax_rgb_blend), in the same two-pass shape:

    1. ``rasterize_topk`` picks the K nearest in-skirt faces per pixel —
       discrete, gradient-free (as in pytorch3d);
    2. each pixel differentiably shades ONLY its K faces: contribution
       ``sigmoid(d/σ) · exp(z_norm/γ)`` with d the signed pixel distance to
       the boundary (positive inside) and z_norm ∈ [0,1] normalized nearness
       — a softmax z-buffer, so occlusion resolves and gradients flow through
       both shading (barycentric colors) and silhouette (the sigmoid skirt).
       Background carries weight 1 (pytorch3d's exp(eps/γ));
       coverage = acc/(acc+1).

    The split keeps the backward pass O(pixels · K) instead of
    O(pixels · triangles) — the all-pairs single-pass variant spent 4.2 s/iter
    on AD residuals of the triangle scan; this runs the scan residual-free.
    """
    h, w = hw
    p = h * w
    uv = project(points_cam, focal, center)               # [N, 2]
    z = jnp.maximum(-points_cam[..., 2], 1e-4)            # positive depth
    zmin = jax.lax.stop_gradient(z.min())
    zmax = jax.lax.stop_gradient(z.max())
    z_norm = (zmax - z) / (zmax - zmin + 1e-6)            # 1 = nearest

    faces = jnp.asarray(faces, jnp.int32)
    # skirt reach: beyond ~4σ the sigmoid tail is <2% — pytorch3d's
    # blur_radius plays the same cutoff role
    sel = rasterize_topk(uv, z_norm, faces, hw, d_max=4.0 * sigma_px,
                         chunk=chunk, k=faces_per_pixel)   # [P, K]

    pix = jnp.stack(
        jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                     jnp.arange(h, dtype=jnp.float32)), -1
    ).reshape(p, 2)
    inv_gamma = 1.0 / gamma
    inv_sigma = 1.0 / sigma_px

    acc_c = jnp.zeros((p, 3))
    acc_w = jnp.zeros((p,))
    for ki in range(faces_per_pixel):
        f = sel[:, ki]                                     # [P]
        valid = (f >= 0).astype(jnp.float32)
        tri = faces[jnp.maximum(f, 0)]                     # [P, 3]
        v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
        a, b, c = uv[v0], uv[v1], uv[v2]                   # [P, 2]
        d, b0, b1, b2, live = _tri_geometry(a, b, c, pix)  # [P]
        prob = jax.nn.sigmoid(d * inv_sigma) * live * valid
        zp = b0 * z_norm[v0] + b1 * z_norm[v1] + b2 * z_norm[v2]
        wgt = prob * jnp.exp(zp * inv_gamma)
        col = (b0[:, None] * colors[v0] + b1[:, None] * colors[v1]
               + b2[:, None] * colors[v2])
        acc_c = acc_c + wgt[:, None] * col
        acc_w = acc_w + wgt
    rgb = acc_c / (acc_w[:, None] + 1.0)    # background weight exp(0/γ) = 1
    cov = acc_w / (acc_w + 1.0)
    return rgb.reshape(h, w, 3), cov.reshape(h, w)


def render_mesh_ss(
    points_cam: jnp.ndarray,
    faces: jnp.ndarray,
    colors: jnp.ndarray,
    focal: jnp.ndarray,
    center: tuple,
    hw: tuple,
    ss: int = 2,
    sigma_px: float = 0.3,
    chunk: int = 256,
):
    """Supersampled soft mesh render → (rgb [H,W,3], cov [H,W]).

    Rasterizes at ``ss``× resolution and box-downsamples — true area
    anti-aliasing, the closest renderer analogue of a photograph (a camera
    integrates radiance over each pixel), and the profile a photometric fit
    should match. BFM triangles are only a few pixels across at capture
    focal lengths; supersampling doubles the silhouette-gradient precision
    and halves the density of rasterization-reselection plateaus that trap
    the optimizer (measured: pose recovery stalls at ~2.4° without it,
    reaches <1° with it)."""
    h, w = hw
    rgb, cov = render_mesh_soft(
        points_cam, faces, colors, focal * ss,
        (center[0] * ss, center[1] * ss), (h * ss, w * ss),
        sigma_px=sigma_px, chunk=chunk)
    return (rgb.reshape(h, ss, w, ss, 3).mean((1, 3)),
            cov.reshape(h, ss, w, ss).mean((1, 3)))


def blur_hw(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur over the H, W axes of [F, H, W, C] (edge
    padding). Linear, so gradients pass straight through — the coarse-to-
    fine device of the photometric fit: blurring BOTH the render and the
    target by the same kernel band-limits the loss symmetrically (blurring
    only one side biases the silhouette; rendering at reduced resolution
    degenerates the few-pixel BFM triangles)."""
    if sigma <= 0:
        return img
    rad = max(1, int(3 * sigma + 0.5))
    x = jnp.arange(-rad, rad + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()

    def conv_axis(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (rad, rad)
        ap = jnp.pad(a, pad, mode="edge")
        out = 0.0
        for j in range(2 * rad + 1):
            out = out + k[j] * jax.lax.dynamic_slice_in_dim(
                ap, j, a.shape[axis], axis)
        return out

    return conv_axis(conv_axis(img, 1), 2)


def geometry_world(model: MorphableModel, id_coef, exp, euler, trans):
    """BFM vertices under per-frame pose: [F, N, 3] camera-space points."""
    mean = jnp.asarray(model.mean)
    n = mean.shape[0]
    b_id = jnp.asarray(model.base_id).reshape(n, 3, -1)
    b_exp = jnp.asarray(model.base_exp).reshape(n, 3, -1)
    pts = (mean[None]
           + jnp.einsum("nvk,k->nv", b_id, id_coef)[None]
           + jnp.einsum("nvk,fk->fnv", b_exp, exp))
    rot = euler_to_rot(euler)
    return jnp.einsum("fij,fnj->fni", rot, pts) + trans[:, None]


def _lm_minimize(resid_fn, v0, iters, lam0=1e-2, retries=8, args=(),
                 jitted=None):
    """Levenberg–Marquardt on a small dense parameter vector.

    The photometric pose endgame is a tiny smooth nonlinear least-squares
    problem (~35 params, tens of thousands of residuals): Adam crawls on it
    (hundreds of iterations, and its fixed-size steps random-walk the weakly
    observable directions), while LM solves it in ~10 Jacobian evaluations.
    Jacobian via jacfwd (one forward render per parameter — cheap at this
    size); Marquardt scaling (damping ∝ diag(JᵀJ)) keeps the step sane
    across the very differently scaled pose/shape/focal axes.

    ``args`` are passed through to resid_fn(v, *args) — chunk data ride as
    arguments so one compiled residual serves every chunk. Callers that
    reuse a residual across many calls pass ``jitted=(resid_j, jac_j)``
    (jitted resid and its jacfwd) to avoid a re-trace per call."""
    if jitted is not None:
        resid_j, jac_j = jitted
    else:
        resid_j = jax.jit(resid_fn)
        jac_j = jax.jit(jax.jacfwd(resid_fn))
    v = v0
    r = resid_j(v, *args)
    cost = float(r @ r)
    lam = lam0
    for _ in range(iters):
        jmat = jac_j(v, *args)
        jtj = jmat.T @ jmat
        g = jmat.T @ r
        dj = jnp.diag(jnp.diag(jtj) + 1e-8)
        for _ in range(retries):
            delta = jnp.linalg.solve(jtj + lam * dj, -g)
            v_new = v + delta
            r_new = resid_j(v_new, *args)
            c_new = float(r_new @ r_new)
            if c_new < cost:
                v, r, cost = v_new, r_new, c_new
                lam = max(lam / 3.0, 1e-7)
                break
            lam *= 4.0
        else:
            break                      # no productive step at any damping
    return v, cost


def refine_photometric(
    model: MorphableModel,
    fit: dict,                  # fit_landmarks output (numpy trees)
    frames: np.ndarray,         # [F, H, W, 3] float targets in [0, 1]
    iters: int = 400,
    lr: float = 2e-3,
    colors: Optional[np.ndarray] = None,   # [N, 3] fixed albedo; else learned
    radius: int = 2,
    sigma: float = 1.0,
    vertex_stride: int = 1,     # subsample vertices for speed at high N
    refine_pose: bool = True,
    faces: Optional[np.ndarray] = None,    # [T, 3] -> soft mesh rasterizer
    landmarks: Optional[np.ndarray] = None,       # [F, L, 2] px anchors
    lmk_vertex_idx: Optional[np.ndarray] = None,  # [L] vertex ids
    reg_id: float = 1.0,
    reg_exp: float = 5.0,
    background: Optional[np.ndarray] = None,      # [H, W, 3] plate
    ss: int = 2,
    lm_schedule: tuple = ((1.0, 0.3, 6), (0.25, 0.1, 6), (0.0, 0.02, 10)),
    lm_frame_budget: int = 200_000_000,  # max Jacobian elements per LM solve
) -> dict:
    """Photometric pose refinement (the reference's differentiable-render
    stage, render_3dmm.py:1-25) on top of a landmark fit.

    With ``faces`` (or a model that carries topology) the refinement runs
    the pytorch3d-equivalent mesh path: supersampled z-buffered soft
    rasterization (``render_mesh_ss``), a TWO-SIDED full-image photometric
    loss, and Levenberg–Marquardt over per-frame pose + per-frame exp +
    shared id + shared focal with the reference's coefficient
    regularization (face_tracker.py regularizes id/exp throughout). Without
    topology it falls back to the Gaussian point-splat + Adam stage.
    refine_pose=False fits only the albedo (texture-solve mode).

    Design notes, each empirically load-bearing on the synthetic suite:

    - **Two-sided loss.** The loss is plain MSE over the full image between
      the background-composited render and the target (``background`` plate,
      default black — the nerf data pipeline extracts one, reference
      process.py task 5). Masking by rendered coverage (the obvious
      translation of the reference's masked col loss, util.py:99-109) makes
      the loss ONE-SIDED: shrinking/retreating the face hides misfit pixels
      for free, and the fit drifts backward along the landmark-null depth
      axis (measured: +19 units of z drift, monotone, loss *rising* under
      Adam).
    - **Free id/exp/focal + regularization.** Freezing the shape basis at
      the noisy landmark solution moves the photometric optimum away from
      the true pose (starting AT ground truth, the optimizer walks 5-8° off
      to compensate the wrong shape). Freed but unregularized, per-frame exp
      forms a scale-mode with per-frame depth. ``reg_id``/``reg_exp`` pin
      those modes — same device as the reference's id/exp penalty terms.
    - **Blur-anneal ``lm_schedule``.** Each (beta, lan_w, iters) stage blurs
      BOTH the render and the target by a Gaussian of width beta
      (symmetric band-limiting — the capture range of the sharp render's
      texture gradient is about one texture wavelength, narrower than the
      landmark fit's residual) while annealing the landmark-anchor weight so
      the exactly-rendered photometric term, not the noisy anchor, decides
      the endgame. lan units follow the reference (squared pixels,
      face_tracker.py:351-353 weights its pose stage 0.5·col + (8→1.5)·lan).
    - **LM over Adam.** See ``_lm_minimize`` — ~20 Jacobian evaluations
      replace ~1000 Adam steps and none of Adam's random-walk drift along
      the weakly observable axes.
    - **Bounded-memory decomposition.** The joint Jacobian grows as
      [F·H·W·3, (6+Ke)F + Ki + 1]; past ``lm_frame_budget`` elements the
      solve decomposes: an evenly spaced anchor subset solves the shared
      id/focal (+ albedo) jointly, then the remaining frames solve their
      independent pose/exp in fixed-size chunks against the frozen shared
      state (one compiled residual per blur stage, chunk data as
      arguments) — real multi-hundred-frame captures stay in memory.

    Caveat: absolute depth retains a focal·depth gauge freedom (a shared
    z/focal rescale moves landmarks <0.2 px at capture geometry); the
    recovered focal typically lands within ~0.5% and per-frame poses are
    sharp, which is what the NeRF data pipeline needs."""
    import optax

    f, h, w = frames.shape[:3]
    center = (w / 2.0, h / 2.0)
    target = jnp.asarray(frames, jnp.float32)
    focal = jnp.asarray(fit["focal"], jnp.float32)
    id_coef = jnp.asarray(fit["id"])
    exp = jnp.asarray(fit["exp"])

    if faces is None:
        faces = getattr(model, "faces", None)
    if faces is not None and vertex_stride != 1:
        raise ValueError("vertex_stride applies to the splat fallback only; "
                         "mesh topology indexes the full vertex set")
    mesh_faces = None if faces is None else jnp.asarray(faces, jnp.int32)

    if (landmarks is None) != (lmk_vertex_idx is None):
        raise ValueError("landmarks and lmk_vertex_idx go together")
    if landmarks is not None and vertex_stride != 1:
        raise ValueError("landmark anchoring indexes the full vertex set; "
                         "use vertex_stride=1")
    lmk_px = None if landmarks is None else jnp.asarray(landmarks,
                                                        jnp.float32)
    lmk_idx = None if landmarks is None else np.asarray(lmk_vertex_idx)

    sub = slice(None, None, vertex_stride)
    submodel = MorphableModel(
        mean=model.mean[sub],
        base_id=model.base_id.reshape(-1, 3, model.base_id.shape[-1])[sub]
                     .reshape(-1, model.base_id.shape[-1]),
        base_exp=model.base_exp.reshape(-1, 3, model.base_exp.shape[-1])[sub]
                      .reshape(-1, model.base_exp.shape[-1]),
    )
    n_sub = submodel.mean.shape[0]

    learn_colors = colors is None
    if not refine_pose and not learn_colors:
        raise ValueError("refine_pose=False requires learnable colors "
                         "(texture-solve mode)")
    bg = None if background is None else jnp.asarray(background, jnp.float32)

    # ------------------------- mesh path: LM -------------------------
    if refine_pose and mesh_faces is not None:
        ke = exp.shape[-1]
        ki = id_coef.shape[-1]

        def render_frames(pts, cols, fo):
            def one(q):
                rgb, cov = render_mesh_ss(q, mesh_faces, cols, fo, center,
                                          (h, w), ss=ss)
                if bg is not None:
                    rgb = rgb + bg * (1.0 - cov[..., None])
                return rgb
            return jax.vmap(one)(pts)

        # ---- capacity: the JOINT Jacobian is [n·h·w·3, n(6+ke)+ki+1]
        # (jacfwd materializes it) — fine at test scale but terabytes on a
        # real capture (ADVICE r3 high). Cap the jointly-solved frame count
        # by a Jacobian element budget and decompose beyond it: per-frame
        # pose/exp are independent given shared id/focal, so an anchor
        # subset solves the shared parameters jointly and the remaining
        # frames solve pose/exp in fixed-size chunks against the frozen
        # shared state (one compiled residual per blur stage, chunk data
        # passed as arguments).
        rows_pf = h * w * 3

        def cap_frames(extra_params: int) -> int:
            c = 1
            while (c < f and (c + 1) * rows_pf
                   * ((c + 1) * (6 + ke) + extra_params) <= lm_frame_budget):
                c += 1
            return c

        def joint_solve(idx: np.ndarray, cols):
            """Joint LM over frames ``idx``: per-frame pose/exp + shared
            id/focal (+ albedo cycles when learned). Returns (pose, cols)."""
            nf = len(idx)
            tgt = target[idx]
            lmk_i = None if lmk_px is None else lmk_px[idx]

            def pack(p):
                # trans in hundreds of model units — bring the axes to a
                # common scale so Marquardt damping treats them evenly
                return jnp.concatenate([
                    p["euler"].ravel(), p["trans"].ravel() / 100.0,
                    p["exp"].ravel(), p["id"].ravel(), p["log_focal"][None]])

            def unpack(v):
                i = 0
                euler = v[i:i + 3 * nf].reshape(nf, 3); i += 3 * nf
                trans = v[i:i + 3 * nf].reshape(nf, 3) * 100.0; i += 3 * nf
                expc = v[i:i + ke * nf].reshape(nf, ke); i += ke * nf
                idc = v[i:i + ki]; i += ki
                return {"euler": euler, "trans": trans, "exp": expc,
                        "id": idc, "log_focal": v[i]}

            npx = float(nf * h * w * 3)

            def make_resid(beta, lan_w, cols):
                target_s = blur_hw(tgt, beta)

                def resid(v):
                    p = unpack(v)
                    fo = jnp.exp(p["log_focal"])
                    pts = geometry_world(submodel, p["id"], p["exp"],
                                         p["euler"], p["trans"])
                    rgb = blur_hw(render_frames(pts, cols, fo), beta)
                    parts = [((rgb - target_s)
                              * jnp.sqrt(0.5 * 255.0 / npx)).ravel()]
                    if lmk_i is not None:
                        proj = project(pts[:, lmk_idx], fo, center)
                        parts.append(((proj - lmk_i)
                                      * jnp.sqrt(lan_w / lmk_i.size)).ravel())
                    parts.append(jnp.sqrt(reg_id) * p["id"])
                    parts.append(jnp.sqrt(reg_exp / nf) * p["exp"].ravel())
                    return jnp.concatenate(parts)

                return resid

            def solve_colors(pose, cols, steps):
                # albedo at frozen pose: plain Adam — the color subproblem
                # is smooth and near-linear, and keeping it out of LM keeps
                # the normal equations tiny
                pts = geometry_world(submodel, pose["id"], pose["exp"],
                                     pose["euler"], pose["trans"])
                fo = jnp.exp(pose["log_focal"])
                tx = optax.adam(lr * 15.0)
                st = tx.init(cols)

                @jax.jit
                def step(cols, st):
                    def loss(c):
                        rgb = render_frames(pts, jnp.clip(c, 0.0, 1.0), fo)
                        return ((rgb - tgt) ** 2).sum(-1).mean()
                    mse, g = jax.value_and_grad(loss)(cols)
                    up, st2 = tx.update(g, st)
                    return optax.apply_updates(cols, up), st2, mse

                for _ in range(steps):
                    cols, st, _mse = step(cols, st)
                return jnp.clip(cols, 0.0, 1.0)

            pose = {
                "euler": jnp.asarray(fit["euler"], jnp.float32)[idx],
                "trans": jnp.asarray(fit["trans"], jnp.float32)[idx],
                "exp": exp.astype(jnp.float32)[idx],
                "id": id_coef.astype(jnp.float32),
                "log_focal": jnp.log(focal),
            }
            cycles = 2 if learn_colors else 1
            for _ in range(cycles):
                if learn_colors:
                    cols = solve_colors(pose, cols,
                                        max(1, iters // (2 * cycles)))
                v = pack(pose)
                for beta, lan_w, nit in lm_schedule:
                    v, _ = _lm_minimize(make_resid(beta, lan_w, cols), v, nit)
                pose = unpack(v)
            return pose, cols

        cols = (jnp.full((n_sub, 3), 0.5) if learn_colors
                else jnp.clip(jnp.asarray(colors[sub], jnp.float32), 0, 1))
        c_joint = cap_frames(ki + 1)

        if f <= c_joint:
            pose, cols = joint_solve(np.arange(f), cols)
            euler_all = np.asarray(pose["euler"])
            trans_all = np.asarray(pose["trans"])
            exp_all = np.asarray(pose["exp"])
            id_final, logf_final = pose["id"], pose["log_focal"]
        else:
            # anchor: evenly spaced representative frames solve the shared
            # id/focal (+ albedo); the rest solve pose/exp in chunks
            anchor = np.unique(np.linspace(0, f - 1, c_joint)
                               .round().astype(int))
            pose_a, cols = joint_solve(anchor, cols)
            id_final, logf_final = pose_a["id"], pose_a["log_focal"]
            idfo = jnp.concatenate([id_final, logf_final[None]])

            euler_all = np.asarray(fit["euler"], np.float32).copy()
            trans_all = np.asarray(fit["trans"], np.float32).copy()
            exp_all = np.asarray(exp, np.float32).copy()
            euler_all[anchor] = np.asarray(pose_a["euler"])
            trans_all[anchor] = np.asarray(pose_a["trans"])
            exp_all[anchor] = np.asarray(pose_a["exp"])

            csize = cap_frames(0)
            pfp = 6 + ke

            def unpack_c(v):
                return (v[:3 * csize].reshape(csize, 3),
                        v[3 * csize:6 * csize].reshape(csize, 3) * 100.0,
                        v[6 * csize:].reshape(csize, ke))

            def make_chunk_solver(beta, lan_w):
                """One compiled residual per blur stage; chunk targets and
                landmarks ride as ARGUMENTS so every chunk reuses it."""
                cnpx = float(csize * h * w * 3)

                def resid(v, tgt_s, lmk_c, idfo):
                    e, t, x = unpack_c(v)
                    fo = jnp.exp(idfo[ki])
                    pts = geometry_world(submodel, idfo[:ki], x, e, t)
                    rgb = blur_hw(render_frames(pts, cols, fo), beta)
                    parts = [((rgb - tgt_s)
                              * jnp.sqrt(0.5 * 255.0 / cnpx)).ravel()]
                    if lmk_px is not None:
                        proj = project(pts[:, lmk_idx], fo, center)
                        parts.append(
                            ((proj - lmk_c)
                             * jnp.sqrt(lan_w / lmk_c.size)).ravel())
                    parts.append(jnp.sqrt(reg_exp / csize) * x.ravel())
                    return jnp.concatenate(parts)

                return jax.jit(resid), jax.jit(jax.jacfwd(resid))

            stages = [(s, make_chunk_solver(s[0], s[1])) for s in lm_schedule]
            rest = np.setdiff1d(np.arange(f), anchor)
            for c0 in range(0, len(rest), csize):
                chunk = rest[c0:c0 + csize]
                real = len(chunk)
                if real < csize:        # pad by repeating; results discarded
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], csize - real)])
                v = jnp.concatenate([
                    jnp.asarray(euler_all[chunk]).ravel(),
                    jnp.asarray(trans_all[chunk]).ravel() / 100.0,
                    jnp.asarray(exp_all[chunk]).ravel()])
                lmk_c = (jnp.zeros((csize, 1, 2)) if lmk_px is None
                         else lmk_px[chunk])
                for (beta, _lan_w, nit), jitted in stages:
                    tgt_s = blur_hw(target[chunk], beta)
                    v, _ = _lm_minimize(None, v, nit, jitted=jitted,
                                        args=(tgt_s, lmk_c, idfo))
                e, t, x = unpack_c(v)
                euler_all[chunk[:real]] = np.asarray(e)[:real]
                trans_all[chunk[:real]] = np.asarray(t)[:real]
                exp_all[chunk[:real]] = np.asarray(x)[:real]

        # final photometric error, accumulated in render-chunks so large
        # captures never materialize an [F, H, W, 3] render at once
        fo_final = jnp.exp(logf_final)
        sse, cnt = 0.0, 0
        for c0 in range(0, f, max(1, c_joint)):
            sl = slice(c0, min(f, c0 + max(1, c_joint)))
            pts = geometry_world(submodel, id_final,
                                 jnp.asarray(exp_all[sl]),
                                 jnp.asarray(euler_all[sl]),
                                 jnp.asarray(trans_all[sl]))
            rgb = render_frames(pts, cols, fo_final)
            sse += float(((rgb - target[sl]) ** 2).sum(-1).sum())
            cnt += (sl.stop - sl.start) * h * w
        mse = sse / max(cnt, 1)

        out = dict(fit)
        out["euler"] = euler_all
        out["trans"] = trans_all
        out["exp"] = exp_all
        out["id"] = np.asarray(id_final)
        out["focal"] = float(np.exp(np.asarray(logf_final)))
        out["photo_rmse"] = float(np.sqrt(mse))
        if learn_colors:
            out["colors"] = np.asarray(cols)
        return out

    # --------------- splat fallback / texture-solve: Adam ---------------
    params = {
        "euler": jnp.asarray(fit["euler"]),
        "trans": jnp.asarray(fit["trans"]),
    }
    if learn_colors:
        params["colors"] = jnp.full((n_sub, 3), 0.5)
    fixed_colors = None if learn_colors else jnp.asarray(colors[sub])

    # Parameter groups live on very different scales (radians vs hundreds of
    # model units vs [0,1] albedo) — per-group LRs, like the reference's
    # separate optimizer groups in its photometric stage.
    lr_scale = {"euler": 1.0, "trans": 50.0, "colors": 15.0}

    def loss_fn(p, lan_w):
        cols = p["colors"] if learn_colors else fixed_colors
        cols = jnp.clip(cols, 0.0, 1.0)
        pts = geometry_world(submodel, id_coef, exp, p["euler"], p["trans"])

        if mesh_faces is not None:     # texture-solve over the mesh render
            def render_one(pts_f):
                rgb, cov = render_mesh_ss(pts_f, mesh_faces, cols, focal,
                                          center, (h, w), ss=ss)
                if bg is not None:
                    rgb = rgb + bg * (1.0 - cov[..., None])
                return rgb
            rgb = jax.vmap(render_one)(pts)
            col = ((rgb - target) ** 2).sum(-1).mean()
        else:
            def render_one(pts_f):
                return render_splat(pts_f, cols, focal, center,
                                    (h, w), radius=radius, sigma=sigma)
            rgb, cov = jax.vmap(render_one)(pts)
            mask = cov / (cov + 0.5)        # soft coverage mask
            err = ((rgb - target) ** 2).sum(-1) * mask
            col = err.sum() / (mask.sum() + 1e-6)
        loss = col
        if lmk_px is not None:
            # the reference's units: cal_lan_loss = mean squared PIXEL
            # residual, cal_col_loss ≈ 255 × our unit-scale masked MSE
            # (util.py:99-109; pose-stage weights face_tracker.py:351-353)
            proj = project(pts[:, lmk_idx], focal, center)
            lan = jnp.mean((proj - lmk_px) ** 2)
            loss = 0.5 * 255.0 * col + lan_w * lan
        return loss, col

    def make_step(scales):
        tx = optax.multi_transform(
            {k: optax.adam(lr * s) for k, s in scales.items()},
            {k: k for k in params},
        )

        @jax.jit
        def step(params, opt_state, lan_w):
            (_, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, lan_w)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, mse

        return tx, step

    mse = jnp.inf
    if learn_colors:
        # phase 1: fit the albedo with the pose frozen — a half-fit albedo
        # steering the pose corrupts it (the reference likewise solves
        # texture/light before its pose rounds)
        tx, step = make_step({**lr_scale, "euler": 0.0, "trans": 0.0})
        opt_state = tx.init(params)
        for _ in range(max(1, iters if not refine_pose else iters // 3)):
            params, opt_state, mse = step(params, opt_state, 0.0)
    if refine_pose:
        tx, step = make_step(lr_scale)
        opt_state = tx.init(params)
        for i in range(iters):
            # reference pose-stage schedule: lan ×8 for the first 50 iters,
            # ×1.5 after (face_tracker.py:351-353)
            lan_w = 8.0 if i < 50 else 1.5
            params, opt_state, mse = step(params, opt_state, lan_w)

    out = dict(fit)
    out["euler"] = np.asarray(params["euler"])
    out["trans"] = np.asarray(params["trans"])
    out["photo_rmse"] = float(np.sqrt(np.asarray(mse)))
    if learn_colors:
        out["colors"] = np.asarray(jnp.clip(params["colors"], 0.0, 1.0))
    return out


def pose_errors(euler_a, trans_a, euler_b, trans_b) -> tuple:
    """(mean rotation error in degrees, mean translation error) between two
    per-frame pose sets — the test metric for synthetic pose recovery."""
    ra = np.asarray(euler_to_rot(jnp.asarray(euler_a)))
    rb = np.asarray(euler_to_rot(jnp.asarray(euler_b)))
    rel = np.einsum("fij,fkj->fik", ra, rb)   # Ra · Rbᵀ
    cos = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1.0, 1.0)
    rot_deg = np.degrees(np.arccos(cos)).mean()
    trans_err = np.linalg.norm(
        np.asarray(trans_a) - np.asarray(trans_b), axis=-1).mean()
    return float(rot_deg), float(trans_err)
