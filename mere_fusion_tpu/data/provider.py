"""ER-NeRF test-time dataset: poses, blink areas, background.

Equivalent of the reference's NeRFDataset_Test
(reference: ernerf/nerf_triplane/provider.py:84-360): transforms.json poses
converted to NGP coordinates, optional camera-path smoothing, AU45 blink
areas from OpenFace's au.csv, per-index collate producing rays + background
+ eye state, with infinite mirrored looping for live streaming.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

import cv2
import numpy as np


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float, offset=(0, 0, 0)) -> np.ndarray:
    """Axis permutation + scaling into the NGP convention (provider.py:19-26)."""
    return np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )


def ngp_to_nerf_matrix(pose: np.ndarray, scale: float, offset=(0, 0, 0)) -> np.ndarray:
    """Exact inverse of nerf_matrix_to_ngp (for synthesizing datasets)."""
    out = np.eye(4, dtype=np.float32)
    # rows of the pre-matrix: pre[0] ← post row 2, pre[1] ← post row 0,
    # pre[2] ← post row 1, with column sign flips undone
    out[0, :3] = pose[2, :3] * np.array([1, -1, -1])
    out[1, :3] = pose[0, :3] * np.array([1, -1, -1])
    out[2, :3] = pose[1, :3] * np.array([1, -1, -1])
    out[0, 3] = (pose[2, 3] - offset[2]) / scale
    out[1, 3] = (pose[0, 3] - offset[0]) / scale
    out[2, 3] = (pose[1, 3] - offset[1]) / scale
    return out


def smooth_camera_path(poses: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    n = poses.shape[0]
    k = kernel_size // 2
    trans = poses[:, :3, 3].copy()
    rots = poses[:, :3, :3].copy()
    for i in range(n):
        lo, hi = max(0, i - k), min(n, i + k + 1)
        poses[i, :3, 3] = trans[lo:hi].mean(0)
        poses[i, :3, :3] = Rotation.from_matrix(rots[lo:hi]).mean().as_matrix()
    return poses


@dataclass
class NeRFTestDataset:
    poses: np.ndarray        # [N, 4, 4] NGP-space c2w
    eye_area: np.ndarray     # [N] in [0, 1] (AU45/2 clipped)
    bg_img: np.ndarray       # [H, W, 3] float32 RGB
    intrinsics: tuple        # (fx, fy, cx, cy)
    H: int
    W: int

    def __len__(self) -> int:
        return self.poses.shape[0]

    def mirror_index(self, index: int) -> int:
        size = len(self)
        turn, res = divmod(index, size)
        return res if turn % 2 == 0 else size - res - 1

    def collate(self, index: int) -> dict:
        i = self.mirror_index(index)
        return {
            "index": i,
            "pose": self.poses[i],
            "eye": np.asarray([[self.eye_area[i]]], np.float32),
            "bg_color": self.bg_img.reshape(-1, 3),
        }

    def __iter__(self):
        i = 0
        while True:
            yield self.collate(i)
            i += 1

    @classmethod
    def load(
        cls,
        pose_path: str,
        au_path: str = "",
        bg_img: str = "white",
        scale: float = 4.0,
        offset=(0, 0, 0),
        smooth_path: bool = False,
        smooth_path_window: int = 7,
        smooth_eye: bool = False,
        data_range=(0, -1),
        downscale: int = 1,
    ) -> "NeRFTestDataset":
        with open(pose_path) as f:
            transform = json.load(f)
        H = int(transform["cy"]) * 2 // downscale
        W = int(transform["cx"]) * 2 // downscale
        frames = transform["frames"]
        end = data_range[1] if data_range[1] != -1 else len(frames)
        frames = frames[data_range[0] : end]

        au_blink = None
        if au_path:
            import pandas as pd

            au = pd.read_csv(au_path)
            au_blink = au[" AU45_r"].values

        poses, eye_area = [], []
        for f in frames:
            poses.append(
                nerf_matrix_to_ngp(
                    np.array(f["transform_matrix"], np.float32), scale, offset
                )
            )
            if au_blink is not None:
                area = float(np.clip(au_blink[f["img_id"]], 0, 2)) / 2
            else:
                area = 0.25  # default open eye
            eye_area.append(area)
        poses = np.stack(poses)
        if smooth_path:
            poses = smooth_camera_path(poses, smooth_path_window)
        eye_area = np.asarray(eye_area, np.float32)
        if smooth_eye:
            smoothed = eye_area.copy()
            for i in range(len(eye_area)):
                lo, hi = max(0, i - 1), min(len(eye_area), i + 2)
                smoothed[i] = eye_area[lo:hi].mean()
            eye_area = smoothed

        if bg_img == "white":
            bg = np.ones((H, W, 3), np.float32)
        elif bg_img == "black":
            bg = np.zeros((H, W, 3), np.float32)
        else:
            img = cv2.imread(bg_img, cv2.IMREAD_UNCHANGED)
            if img.shape[:2] != (H, W):
                img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
            bg = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255

        fl = transform["focal_len"]
        intrinsics = (fl, fl, transform["cx"] / downscale, transform["cy"] / downscale)
        return cls(poses, eye_area, bg, intrinsics, H, W)


class LazyFrames:
    """preload=0 image store: decode ground-truth frames from disk on
    access with a small LRU (reference NeRFDataset preload 0,
    provider.py:362-807 — images stay on disk, read per item). Supports the
    eager array's consumer surface: len, [i] → float32 [H, W, 3], .shape."""

    def __init__(self, paths: list, cache: int = 16):
        from collections import OrderedDict

        self._paths = paths
        self._lru: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._cap = cache
        first = self._decode(0)
        self.shape = (len(paths),) + first.shape

    @staticmethod
    def _imread(path: str) -> np.ndarray:
        return cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)

    def _decode(self, i: int) -> np.ndarray:
        img = self._imread(self._paths[i]).astype(np.float32) / 255
        self._lru[i] = img
        if len(self._lru) > self._cap:
            self._lru.popitem(last=False)
        return img

    def __len__(self) -> int:
        return len(self._paths)

    def __getitem__(self, i: int) -> np.ndarray:
        hit = self._lru.get(i)
        if hit is not None:
            self._lru.move_to_end(i)
            return hit
        return self._decode(i)


@dataclass
class NeRFTrainDataset:
    """Training-time dataset: poses + ground-truth images + per-frame audio
    feature windows + blink areas + face masks.

    Equivalent of the reference NeRFDataset in train mode
    (provider.py:362-807): images, face masks, precomputed [N,16,A] audio
    logits (--aud npy), AU45 blink areas, with random-pixel ray batches.
    """

    poses: np.ndarray        # [N, 4, 4]
    images: np.ndarray       # [N, H, W, 3] float32 RGB in [0,1]
    auds: np.ndarray         # [N, A, 16] audio windows
    eye_area: np.ndarray     # [N]
    face_masks: np.ndarray   # [N, H, W] bool
    bg_img: np.ndarray       # [H, W, 3]
    intrinsics: tuple
    H: int
    W: int
    torso_imgs: np.ndarray | None = None  # [N, H, W, 4] RGBA in [0,1]
    lips_rects: np.ndarray | None = None  # [N, 4] (rmin, rmax, cmin, cmax)
    # preload=2 (device-resident) tier: u8 frames / bool masks / f32 bg
    # pinned in HBM, batch gathers run on device (see sample_rays)
    images_dev: object | None = None      # [N, H·W, 3] u8 jax array
    masks_dev: object | None = None       # [N, H·W] bool jax array
    bg_dev: object | None = None          # [H·W, 3] f32 jax array

    def __len__(self) -> int:
        return len(self.poses)

    def sample_lips_rays(self, index: int, rng: np.random.Generator,
                         size: int = 64, att_window: int = 8) -> dict:
        """Fixed-size lips window for the lips-finetune stage.

        The reference samples exactly the per-frame squared lips rect
        (provider.py:549-564, utils.py:824-831), whose size varies by frame
        — a dynamic shape. On TPU the window is a static size×size crop
        centered on the lips rect and clamped in-bounds, so one compiled
        step serves every frame. Returns the standard ray-batch keys.
        """
        import jax.numpy as jnp

        from mere_fusion_tpu.models.ernerf.renderer import get_rays

        assert self.lips_rects is not None, "dataset has no lips rects (.lms)"
        rmin, rmax, cmin, cmax = self.lips_rects[index]
        cy, cx = (rmin + rmax) // 2, (cmin + cmax) // 2
        half = size // 2
        r0 = int(np.clip(cy - half, 0, self.H - size))
        c0 = int(np.clip(cx - half, 0, self.W - size))
        dy, dx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
        sel = ((r0 + dy) * self.W + (c0 + dx)).reshape(-1)

        pose = jnp.asarray(self.poses[index])
        rays_o, rays_d = get_rays(pose, self.intrinsics, self.H, self.W)
        img = self.images[index].reshape(-1, 3)
        mask = self.face_masks[index].reshape(-1)
        idx = np.clip(
            np.arange(index - att_window // 2, index + att_window // 2),
            0, len(self) - 1,
        )
        return {
            "rays_o": jnp.asarray(np.asarray(rays_o)[sel]),
            "rays_d": jnp.asarray(np.asarray(rays_d)[sel]),
            "rgb": jnp.asarray(img[sel]),
            "bg_color": jnp.asarray(self.bg_img.reshape(-1, 3)[sel]),
            "auds": jnp.asarray(self.auds[idx]),
            "eye": jnp.asarray([[self.eye_area[index]]], np.float32),
            "index": jnp.asarray(index, np.int32),
            "face_mask": jnp.asarray(mask[sel]),
        }

    def sample_torso_rays(self, index: int, num_rays: int,
                          rng: np.random.Generator) -> dict:
        """Batch for the torso fine-tune stage (reference provider's
        bg_torso_color path, provider.py:180-194 + utils.py:750): pixel
        centers in [−1,1]² and the torso image alpha-composited over the
        background as the target."""
        import jax.numpy as jnp

        assert self.torso_imgs is not None, "dataset has no torso_imgs/"
        sel = rng.integers(0, self.H * self.W, size=num_rays)
        ys, xs = sel // self.W, sel % self.W
        coords = np.stack(
            [(xs + 0.5) / self.W * 2 - 1, (ys + 0.5) / self.H * 2 - 1], -1
        ).astype(np.float32)
        torso = self.torso_imgs[index].reshape(-1, 4)[sel]
        bg = self.bg_img.reshape(-1, 3)[sel]
        gt = torso[:, :3] * torso[:, 3:] + bg * (1 - torso[:, 3:])
        return {
            "coords": jnp.asarray(coords),
            "bg_torso_color": jnp.asarray(gt.astype(np.float32)),
            "bg_color": jnp.asarray(bg.astype(np.float32)),
            "pose": jnp.asarray(self.poses[index]),
            "index": jnp.asarray(index, np.int32),
        }

    def sample_rays(self, index: int, num_rays: int, rng: np.random.Generator,
                    att_window: int = 8, patch_size: int | None = None) -> dict:
        """Build one training batch of num_rays random pixels.

        patch_size: sample contiguous patch_size×patch_size pixel patches
        instead of scattered pixels (the reference's get_rays patch mode,
        utils.py:291-305, used for the LPIPS patch loss). num_rays must be a
        multiple of patch_size²; pass the same (patch_size, patch_size) as
        make_nerf_train_step's static patch_hw.
        """
        import jax.numpy as jnp

        from mere_fusion_tpu.models.ernerf.renderer import get_rays

        pose = jnp.asarray(self.poses[index])
        rays_o, rays_d = get_rays(pose, self.intrinsics, self.H, self.W)
        if patch_size is not None:
            ps = patch_size
            num_patch = num_rays // (ps * ps)
            assert num_patch * ps * ps == num_rays, \
                "num_rays must be a multiple of patch_size**2"
            tl_y = rng.integers(0, self.H - ps, size=num_patch)
            tl_x = rng.integers(0, self.W - ps, size=num_patch)
            dy, dx = np.meshgrid(np.arange(ps), np.arange(ps), indexing="ij")
            ys = tl_y[:, None, None] + dy[None]
            xs = tl_x[:, None, None] + dx[None]
            sel = (ys * self.W + xs).reshape(-1)
        else:
            sel = rng.integers(0, self.H * self.W, size=num_rays)
        # attention window of audio features around the frame
        idx = np.clip(
            np.arange(index - att_window // 2, index + att_window // 2),
            0, len(self) - 1,
        )
        if self.images_dev is not None:
            # preload=2: frames live in HBM as u8 — gather ON DEVICE, so
            # per-step host work shrinks to shipping the [num_rays] index
            # vector (reference preload 2 keeps images on the GPU,
            # provider.py:362-807)
            sel_j = jnp.asarray(sel)
            return {
                "rays_o": rays_o[sel_j],
                "rays_d": rays_d[sel_j],
                "rgb": self.images_dev[index][sel_j].astype(jnp.float32)
                       / 255.0,
                "bg_color": self.bg_dev[sel_j],
                "auds": jnp.asarray(self.auds[idx]),
                "eye": jnp.asarray([[self.eye_area[index]]], np.float32),
                "index": jnp.asarray(index, np.int32),
                "face_mask": self.masks_dev[index][sel_j],
            }
        img = self.images[index].reshape(-1, 3)
        mask = self.face_masks[index].reshape(-1)
        return {
            "rays_o": jnp.asarray(np.asarray(rays_o)[sel]),
            "rays_d": jnp.asarray(np.asarray(rays_d)[sel]),
            "rgb": jnp.asarray(img[sel]),
            "bg_color": jnp.asarray(self.bg_img.reshape(-1, 3)[sel]),
            "auds": jnp.asarray(self.auds[idx]),
            "eye": jnp.asarray([[self.eye_area[index]]], np.float32),
            "index": jnp.asarray(index, np.int32),
            "face_mask": jnp.asarray(mask[sel]),
        }

    @classmethod
    def load(cls, root: str, scale: float = 4.0, offset=(0, 0, 0),
             bg_img: str = "white", preload: int = 1) -> "NeRFTrainDataset":
        """Load from an ER-NeRF-format data dir: transforms.json (frames with
        img_id/aud_id), gt_imgs/{img_id}.jpg|png, aud.npy [N,16,A] features,
        au.csv blink areas, optional parsing/{img_id}.png face masks.

        preload tiers (reference NeRFDataset --preload, provider.py:362-807):
          0 — frames stay on disk, decoded per access (LazyFrames LRU);
              for captures that don't fit host RAM.
          1 — frames decoded into host RAM up front (the default).
          2 — additionally pins u8 frames + masks + bg in device HBM and
              batch gathers run on device (sample_rays ships only the
              index vector per step)."""
        import json as _json

        with open(os.path.join(root, "transforms.json")) as f:
            transform = _json.load(f)
        H = int(transform["cy"]) * 2
        W = int(transform["cx"]) * 2
        aud_features = np.load(os.path.join(root, "aud.npy"))
        if aud_features.ndim == 3 and aud_features.shape[1] == 16:
            aud_features = aud_features.transpose(0, 2, 1)  # [N,16,A] → [N,A,16]

        import pandas as pd

        au = pd.read_csv(os.path.join(root, "au.csv"))
        au_blink = au[" AU45_r"].values

        poses, images, auds, eyes, masks = [], [], [], [], []
        img_paths = []
        for f in transform["frames"]:
            poses.append(
                nerf_matrix_to_ngp(
                    np.array(f["transform_matrix"], np.float32), scale, offset
                )
            )
            img_id = f["img_id"]
            for ext in (".jpg", ".png"):
                p = os.path.join(root, "gt_imgs", f"{img_id}{ext}")
                if os.path.exists(p):
                    break
            img_paths.append(p)
            if preload >= 1:
                img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                images.append(img.astype(np.float32) / 255)
            auds.append(aud_features[min(f.get("aud_id", img_id),
                                         len(aud_features) - 1)])
            eyes.append(float(np.clip(au_blink[img_id], 0, 2)) / 2)
            mp = os.path.join(root, "parsing", f"{img_id}.png")
            if os.path.exists(mp):
                parsing = cv2.imread(mp)
                # semantic maps: head is BGR (255,0,0) (face_parsing task,
                # reference test.py:32-44 colors)
                masks.append((parsing[..., 0] > 200) & (parsing[..., 2] < 100))
            else:
                m = np.zeros((H, W), bool)
                m[H // 4 : 3 * H // 4, W // 4 : 3 * W // 4] = True
                masks.append(m)

        if bg_img == "white":
            bg = np.ones((H, W, 3), np.float32)
        else:
            bg = cv2.cvtColor(cv2.imread(bg_img), cv2.COLOR_BGR2RGB).astype(np.float32) / 255

        lips = None
        lms_dirs = [os.path.join(root, d) for d in ("ori_imgs", "gt_imgs")]
        if any(os.path.exists(os.path.join(d,
                                           f"{transform['frames'][0]['img_id']}.lms"))
               for d in lms_dirs if os.path.isdir(d)):
            lips = []
            for f in transform["frames"]:
                lp = next((p for d in lms_dirs
                           for p in [os.path.join(d, f"{f['img_id']}.lms")]
                           if os.path.exists(p)), None)
                if lp is None:
                    raise FileNotFoundError(
                        f"frame {f['img_id']} has no .lms landmark file "
                        f"(searched {lms_dirs}); run nerf_data.landmarks "
                        "over the full frame set first"
                    )
                lms = np.loadtxt(lp)  # [68, 2] (x, y) pixels
                sl = slice(48, 60)
                # squared lips rect (reference provider.py:549-564; their
                # "x" is the row axis = lms[:, 1])
                rmin, rmax = int(lms[sl, 1].min()), int(lms[sl, 1].max())
                cmin, cmax = int(lms[sl, 0].min()), int(lms[sl, 0].max())
                cy, cx = (rmin + rmax) // 2, (cmin + cmax) // 2
                half = max(rmax - rmin, cmax - cmin) // 2
                lips.append([max(0, cy - half), min(H, cy + half),
                             max(0, cx - half), min(W, cx + half)])
            lips = np.asarray(lips, np.int32)

        torso = None
        torso_dir = os.path.join(root, "torso_imgs")
        if os.path.isdir(torso_dir):
            torso = []
            for f in transform["frames"]:
                tp = os.path.join(torso_dir, f"{f['img_id']}.png")
                timg = cv2.imread(tp, cv2.IMREAD_UNCHANGED)  # BGRA
                torso.append(
                    cv2.cvtColor(timg, cv2.COLOR_BGRA2RGBA).astype(np.float32)
                    / 255
                )
            torso = np.stack(torso)

        fl = transform["focal_len"]
        if preload == 0:
            image_store = LazyFrames(img_paths)
        else:
            image_store = np.stack(images)
        images_dev = masks_dev = bg_dev = None
        if preload >= 2:
            import jax
            import jax.numpy as jnp

            n = len(img_paths)
            images_dev = jax.device_put(jnp.asarray(
                np.rint(image_store * 255).astype(np.uint8)
                .reshape(n, H * W, 3)))
            masks_dev = jax.device_put(
                jnp.asarray(np.stack(masks).reshape(n, H * W)))
            bg_dev = jax.device_put(
                jnp.asarray(bg.reshape(H * W, 3).astype(np.float32)))
        return cls(
            torso_imgs=torso,
            lips_rects=lips,
            poses=np.stack(poses),
            images=image_store,
            auds=np.stack(auds).astype(np.float32),
            eye_area=np.asarray(eyes, np.float32),
            face_masks=np.stack(masks),
            bg_img=bg,
            intrinsics=(fl, fl, transform["cx"], transform["cy"]),
            H=H, W=W,
            images_dev=images_dev, masks_dev=masks_dev, bg_dev=bg_dev,
        )


def synthesize_nerf_train_data(dirpath: str, n_frames: int = 4, hw: int = 64,
                               audio_dim: int = 44) -> str:
    """Procedural ER-NeRF training data dir for tests: a moving bright square
    over gray, with matching aud.npy and au.csv."""
    synthesize_nerf_dataset(dirpath, n_frames, hw)
    gt = os.path.join(dirpath, "gt_imgs")
    os.makedirs(gt, exist_ok=True)
    for i in range(n_frames):
        img = np.full((hw, hw, 3), 64, np.uint8)
        o = hw // 4 + i
        img[o : o + hw // 2, o : o + hw // 2] = [220, 180, 140]
        cv2.imwrite(os.path.join(gt, f"{i}.png"), img)
    rng = np.random.default_rng(0)
    np.save(os.path.join(dirpath, "aud.npy"),
            rng.standard_normal((n_frames, 16, audio_dim)).astype(np.float32))
    return dirpath


def synthesize_nerf_dataset(dirpath: str, n_frames: int = 4, hw: int = 64) -> str:
    """Write a tiny procedural transforms.json + au.csv for tests."""
    os.makedirs(dirpath, exist_ok=True)
    frames = []
    for i in range(n_frames):
        # small orbit looking at the origin, authored in NGP space and
        # converted back so loading reproduces it exactly
        angle = 0.08 * i
        c, s = np.cos(angle), np.sin(angle)
        post = np.array(
            [
                [c, 0.0, s, 1.5 * s],
                [0.0, 1.0, 0.0, 0.0],
                [-s, 0.0, c, 1.5 * c],
                [0.0, 0.0, 0.0, 1.0],
            ],
            np.float32,
        )
        mat = ngp_to_nerf_matrix(post, scale=1.0).tolist()
        frames.append({"img_id": i, "aud_id": i, "transform_matrix": mat})
    pose_path = os.path.join(dirpath, "transforms.json")
    with open(pose_path, "w") as f:
        json.dump(
            {"cx": hw / 2, "cy": hw / 2, "focal_len": hw * 1.2, "frames": frames}, f
        )
    au_path = os.path.join(dirpath, "au.csv")
    with open(au_path, "w") as f:
        f.write("frame, face_id, timestamp, confidence, success, AU45_r\n")
        for i in range(n_frames):
            f.write(f"{i+1}, 0, {i*0.04:.3f}, 0.98, 1, {0.2 + 0.1 * (i % 3):.2f}\n")
    return dirpath
