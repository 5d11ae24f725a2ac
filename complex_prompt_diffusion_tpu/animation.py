"""Animation: keyframe schedules, 2D/3D frame warping, the frame loop.

Parity target: /root/reference/cpd/animation.py (488 lines):
  * keyframe strings "0: (0.5), 60: (1.0)" -> interpolated series
    (parse_key_frames :257, interpolate_key_frames :270, KeyFrames :216)
  * 2D warp: rotation/zoom/pan (+ optional perspective flip) via cv2
    (do_2d_animation_step :349-379, warp_matrix :443)
  * 3D warp: depth-based reprojection through a perspective camera pair —
    the reference uses pytorch3d FoV cameras + grid_sample (:291-348);
    reimplemented here with plain numpy projection + cv2.remap.
  * color coherence via LAB histogram matching (match_colors :19-23)
  * render_animation_step (:125-178): per-frame prompt filters/lerps, warp
    previous frame, renoise, partial-chain render.

Host-side cv2/numpy for the warps (per-frame, cheap); the heavy denoising
runs through the jit'd pipeline. Independent-frame latent walks (no
feedback) should use RenderEngine.render_path, which batches frames across
the data mesh axis.
"""

from __future__ import annotations

import dataclasses
import math
import re
from functools import reduce
from typing import Callable, Dict, List, Optional

import numpy as np

__all__ = [
    "AnimArgs",
    "KeyFrames",
    "parse_key_frames",
    "interpolate_key_frames",
    "build_key_frames",
    "match_colors",
    "do_2d_animation_step",
    "do_3d_animation_step",
    "warp_matrix",
    "make_rotation_matrix",
    "render_animation",
]


def parse_key_frames(string: str, prompt_parser=None) -> Dict[int, str]:
    """'0: (0.5), 60: (1.0)' -> {0: '0.5', 60: '1.0'} (animation.py:257-269)."""
    pattern = r"((?P<frame>[0-9]+):[\s]*[\(](?P<param>[\S\s]*?)[\)])"
    frames: Dict[int, str] = {}
    for m in re.finditer(pattern, string):
        frame = int(m.groupdict()["frame"])
        param = m.groupdict()["param"]
        frames[frame] = prompt_parser(param) if prompt_parser else param
    if frames == {} and len(string) != 0:
        raise RuntimeError("Key Frame string not correctly formatted")
    return frames


def interpolate_key_frames(
    key_frames: Dict[int, str],
    max_frames: int,
    integer: bool = False,
    interp_method: str = "Linear",
) -> np.ndarray:
    """Interpolate sparse keyframes onto [0, max_frames) (animation.py:
    270-289). Linear uses np.interp; Quadratic/Cubic use scipy splines with
    the reference's degradation rules for too-few points."""
    items = sorted((k, float(v)) for k, v in key_frames.items())
    xs = np.array([k for k, _ in items], dtype=np.float64)
    ys = np.array([v for _, v in items], dtype=np.float64)
    grid = np.arange(max_frames)

    if interp_method == "Cubic" and len(items) <= 3:
        interp_method = "Quadratic"
    if interp_method == "Quadratic" and len(items) <= 2:
        interp_method = "Linear"

    if interp_method == "Linear" or len(items) == 1:
        series = np.interp(grid, xs, ys)
    else:
        from scipy.interpolate import interp1d

        kind = interp_method.lower()
        f = interp1d(xs, ys, kind=kind, fill_value="extrapolate")
        series = f(np.clip(grid, xs[0], xs[-1]))
    return series.astype(int) if integer else series


def build_key_frames(raw: str, max_frames: int, integer=False, interp_method="Linear"):
    return interpolate_key_frames(
        parse_key_frames(raw), max_frames, integer=integer, interp_method=interp_method
    )


@dataclasses.dataclass
class AnimArgs:
    """get_anim_args defaults (animation.py:180-215)."""

    w: int = 512
    h: int = 512
    max_frames: int = 60
    angle: str = "0: (0)"
    zoom: str = "0: (1.0)"
    pan_x: str = "0: (0)"
    pan_y: str = "0: (0)"
    translation_x: str = "0: (0)"
    translation_y: str = "0: (0)"
    translation_z: str = "0: (0)"
    perspective_flip_theta: str = "0: (0)"
    perspective_flip_phi: str = "0: (0)"
    perspective_flip_gamma: str = "0: (0)"
    perspective_flip_fv: str = "0: (30)"
    rotation_3d_x: str = "0: (0)"
    rotation_3d_y: str = "0: (0)"
    rotation_3d_z: str = "0: (0)"
    coherance_schedule: str = "0: (0)"
    strength_schedule: str = "0: (0)"
    contrast_schedule: str = "0: (0)"
    near_plane: float = 200.0
    far_plane: float = 1000.0
    fov: float = 40.0
    flip_2d_perspective: bool = False
    border: str = "replicate"  # or "wrap"
    sampling_mode: str = "bicubic"
    depth_map: Optional[np.ndarray] = None


class KeyFrames:
    """All interpolated series (animation.py:216-251)."""

    SERIES = [
        "angle", "zoom", "pan_x", "pan_y",
        "translation_x", "translation_y", "translation_z",
        "perspective_flip_theta", "perspective_flip_phi",
        "perspective_flip_gamma", "perspective_flip_fv",
        "rotation_3d_x", "rotation_3d_y", "rotation_3d_z",
        "coherance_schedule", "strength_schedule", "contrast_schedule",
    ]

    def __init__(self, args: AnimArgs):
        for name in self.SERIES:
            setattr(
                self,
                f"{name}_series",
                build_key_frames(getattr(args, name), args.max_frames),
            )


def match_colors(x: np.ndarray, s: np.ndarray) -> np.ndarray:
    """LAB-space histogram matching to a reference frame (animation.py:19-23)."""
    import cv2

    from complex_prompt_diffusion_tpu.noise import match_histograms

    prev_lab = cv2.cvtColor(x, cv2.COLOR_RGB2LAB)
    ref_lab = cv2.cvtColor(s, cv2.COLOR_RGB2LAB)
    matched = match_histograms(prev_lab, ref_lab)
    return cv2.cvtColor(
        np.clip(matched, 0, 255).astype(prev_lab.dtype), cv2.COLOR_LAB2RGB
    )


def make_rotation_matrix(rotation_angles: List[float]) -> np.ndarray:
    """Homogeneous XYZ rotation (animation.py:386-422), degrees input."""
    phi, gamma, theta = [np.deg2rad(a) for a in rotation_angles]
    Rphi = np.eye(4)
    Rphi[1, 1] = Rphi[2, 2] = np.cos(phi)
    Rphi[1, 2], Rphi[2, 1] = -np.sin(phi), np.sin(phi)
    Rgamma = np.eye(4)
    Rgamma[0, 0] = Rgamma[2, 2] = np.cos(gamma)
    Rgamma[0, 2], Rgamma[2, 0] = np.sin(gamma), -np.sin(gamma)
    Rtheta = np.eye(4)
    Rtheta[0, 0] = Rtheta[1, 1] = np.cos(theta)
    Rtheta[0, 1], Rtheta[1, 0] = -np.sin(theta), np.sin(theta)
    return reduce(np.matmul, [Rphi, Rgamma, Rtheta])


def warp_matrix(W, H, theta, phi, gamma, scale, fV):
    """Perspective-flip homography (animation.py:443-487)."""
    import cv2

    fVhalf = np.deg2rad(fV / 2.0)
    d = np.sqrt(W * W + H * H)
    side_length = scale * d / np.cos(fVhalf)
    h = d / (2.0 * np.sin(fVhalf))
    n = h - d / 2.0
    f = h + d / 2.0

    T = np.eye(4)
    T[2, 3] = -h
    R = make_rotation_matrix([phi, gamma, theta])

    ptsIn = np.array(
        [[
            [-W / 2.0, H / 2.0, 0.0], [W / 2.0, H / 2.0, 0.0],
            [W / 2.0, -H / 2.0, 0.0], [-W / 2.0, -H / 2.0, 0.0],
        ]]
    )
    ptsOut = np.zeros_like(ptsIn)
    halfFov = np.tan(fVhalf)
    pts = (T @ R).dot(
        np.concatenate([ptsIn[0], np.ones((4, 1))], axis=1).T
    ).T
    for i in range(4):
        x, y, z = pts[i, 0], pts[i, 1], pts[i, 2]
        ptsOut[0, i] = [x / (-z * halfFov), y / (-z * halfFov), 0.0]

    pin = ptsIn[0, :, :2] + np.array([W / 2.0, H / 2.0])
    pout = (ptsOut[0, :, :2] + 1.0) * (0.5 * side_length)
    M = cv2.getPerspectiveTransform(
        pin.astype(np.float32), pout.astype(np.float32)
    )
    return M, side_length


def do_2d_animation_step(
    img_np: np.ndarray, frame_idx: int, keys: KeyFrames, args: AnimArgs
) -> np.ndarray:
    """Affine/perspective 2D warp (animation.py:349-379)."""
    import cv2

    angle = keys.angle_series[frame_idx]
    zoom = keys.zoom_series[frame_idx]
    pan_x = keys.pan_x_series[frame_idx]
    pan_y = keys.pan_y_series[frame_idx]

    center = (args.w // 2, args.h // 2)
    trans_mat = np.vstack(
        [np.float32([[1, 0, pan_x], [0, 1, pan_y]]), [0, 0, 1]]
    )
    rot_mat = np.vstack([cv2.getRotationMatrix2D(center, angle, zoom), [0, 0, 1]])
    if args.flip_2d_perspective:
        M, sl = warp_matrix(
            args.w, args.h,
            keys.perspective_flip_theta_series[frame_idx],
            keys.perspective_flip_phi_series[frame_idx],
            keys.perspective_flip_gamma_series[frame_idx],
            1.0,
            keys.perspective_flip_fv_series[frame_idx],
        )
        post = np.vstack(
            [np.float32([[1, 0, (args.w - sl) / 2], [0, 1, (args.h - sl) / 2]]), [0, 0, 1]]
        )
        xform = np.matmul(np.matmul(M, post), rot_mat, trans_mat)
    else:
        xform = np.matmul(rot_mat, trans_mat)

    return cv2.warpPerspective(
        img_np,
        xform,
        (img_np.shape[1], img_np.shape[0]),
        borderMode=cv2.BORDER_WRAP if args.border == "wrap" else cv2.BORDER_REPLICATE,
    )


def _fov_project(points: np.ndarray, R: np.ndarray, T: np.ndarray, fov_deg: float):
    """Perspective projection to NDC xy (the pytorch3d FoV camera math the
    reference relies on, animation.py:303-325): view = p @ R + T, then
    x' = f * x / z with f = 1/tan(fov/2)."""
    f = 1.0 / math.tan(math.radians(fov_deg) / 2.0)
    view = points @ R + T
    z = np.where(np.abs(view[:, 2:3]) < 1e-6, 1e-6, view[:, 2:3])
    return f * view[:, :2] / z


def do_3d_animation_step(
    img_np: np.ndarray, frame_idx: int, keys: KeyFrames, args: AnimArgs
) -> np.ndarray:
    """Depth-based 3D reprojection (animation.py:291-348): lift pixels to
    (x, y, depth), project through the old and the moved camera, warp by the
    screen-space offset."""
    import cv2

    TRANSLATION_SCALE = 1.0 / 200.0  # matches Disco (animation.py:292)
    translate = np.array(
        [
            -keys.translation_x_series[frame_idx] * TRANSLATION_SCALE,
            keys.translation_y_series[frame_idx] * TRANSLATION_SCALE,
            -keys.translation_z_series[frame_idx] * TRANSLATION_SCALE,
        ]
    )
    rot = make_rotation_matrix(
        [
            keys.rotation_3d_x_series[frame_idx],
            keys.rotation_3d_y_series[frame_idx],
            keys.rotation_3d_z_series[frame_idx],
        ]
    )[:3, :3]

    h, w = args.h, args.w
    y, x = np.meshgrid(
        np.linspace(-1.0, 1.0, h), np.linspace(-1.0, 1.0, w), indexing="ij"
    )
    if args.depth_map is not None:
        z = np.asarray(args.depth_map, np.float32).reshape(h, w)
    else:
        z = np.full((h, w), 3.0, np.float32)
    pts = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)

    eye = np.eye(3)
    xy_old = _fov_project(pts, eye, np.zeros(3), args.fov)
    xy_new = _fov_project(pts, rot, translate, args.fov)
    offset = (xy_new - xy_old).reshape(h, w, 2)

    # base grid in NDC minus offset -> pixel coords for remap
    gx = (x - offset[:, :, 0] + 1.0) * 0.5 * (w - 1)
    gy = (y - offset[:, :, 1] + 1.0) * 0.5 * (h - 1)
    interp = cv2.INTER_CUBIC if args.sampling_mode == "bicubic" else cv2.INTER_LINEAR
    border = cv2.BORDER_WRAP if args.border == "wrap" else cv2.BORDER_REPLICATE
    return cv2.remap(
        img_np, gx.astype(np.float32), gy.astype(np.float32), interp,
        borderMode=border,
    )


def render_animation(
    bundle,
    prompt_fn: Callable[[int], object],
    cfg,
    anim_args: AnimArgs,
    n_frames: int,
    *,
    keys: Optional[KeyFrames] = None,
    coherance: float = 0.98,
    diversity: float = 0.0,
    seed: int = 0,
    warp_3d: bool = False,
    frame_callback: Optional[Callable] = None,
) -> List[np.ndarray]:
    """Frame loop (render_animation_step, animation.py:125-178).

    prompt_fn(i) -> a ComplexPrompt (or GuidanceSpec) for frame i; each
    frame warps the previous image (2D + optional depth 3D), color-matches
    to frame 0, re-encodes with coherance noise, and renders a partial
    chain with cfg.denoising_strength.
    """
    import jax
    import jax.numpy as jnp

    from complex_prompt_diffusion_tpu import schedules as S
    from complex_prompt_diffusion_tpu.guidance import GuidanceSpec
    from complex_prompt_diffusion_tpu.pipeline import (
        decode_latents,
        encode_image,
        sample_latents,
    )

    keys = keys or KeyFrames(anim_args)
    key = jax.random.PRNGKey(seed)
    frames: List[np.ndarray] = []
    init_frame = None
    prev = None

    for i in range(n_frames):
        k_i = jax.random.fold_in(key, i)
        prompt = prompt_fn(i)
        spec = (
            prompt
            if isinstance(prompt, GuidanceSpec)
            else prompt.build_spec(cfg.height // 8, cfg.width // 8, bundle)
        )
        if prev is None:
            lat = sample_latents(bundle, spec, cfg, key=k_i)
        else:
            img = match_colors(prev, init_frame)
            if warp_3d:
                img = do_3d_animation_step(img, i, keys, anim_args)
            img = do_2d_animation_step(img, i, keys, anim_args)
            k_n, k_e, k_s = jax.random.split(k_i, 3)
            x = jnp.asarray(img, jnp.float32) / 127.5 - 1.0
            x = x + jax.random.normal(k_n, x.shape) * (1.0 - coherance)
            z = encode_image(bundle, np.asarray(x), key=k_e)
            if diversity > 0:
                z = (1 - diversity) * z + np.sqrt(diversity) * jax.random.normal(
                    k_n, z.shape
                )
            itables = S.make_inference_tables(bundle.tables, cfg.steps, eta=cfg.eta)
            s = itables.num_steps
            t_start = max(1, int((1 - cfg.denoising_strength) * s))
            a_t = float(itables.alphas_cumprod_t[t_start - 1])
            noise = jax.random.normal(k_s, z.shape, jnp.float32)
            x_t = np.sqrt(a_t) * z + np.sqrt(1 - a_t) * noise
            lat = sample_latents(
                bundle, spec, cfg, x_init=x_t, key=k_s, t_start=t_start
            )
        img = decode_latents(bundle, lat)[0]
        if init_frame is None:
            init_frame = img
        prev = img
        frames.append(img)
        if frame_callback:
            frame_callback(i, img)
    return frames
