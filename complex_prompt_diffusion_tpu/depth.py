"""Depth estimation + depth-mask conditioning.

Parity target: /root/reference/cpd/depth.py (730 lines). Structure:

  * Estimators are pluggable (the reference hard-wires MiDaS/AdaBins/LeReS
    torch-hub downloads at import time, depth.py:45-124,395-405 — including
    a gdown fetch on module import). Here: a ``DepthEstimator`` protocol, a
    network-gated ``TorchHubMidasEstimator``, and a self-contained
    ``SobelDepthEstimator`` fallback so the conditioning path is always
    exercisable offline.
  * Depth -> mask math (the part that feeds the UNet's 5th latent channel
    and the spatial masks) is exact parity: ``create_depth_mask``
    (depth.py:204-222: bicubic resize then [-1,1] rescale),
    ``build_depth_mask`` (:223-240: 1 - mask, quantile shave, rescale),
    blended ``get_depth`` (:189-198), MiDaS output alignment
    ((50 - d) / 19, :150-152).
  * Boosted depth (:339-594): ``double_estimate`` (two-resolution merge) and
    ``merge_depth``. The reference's pix2pix merge network is an external
    download; ``merge_depth`` accepts any merge model and falls back to a
    frequency blend (low-res base + high-res detail) with the same
    normalization contract.

Everything runs host-side numpy/jax; depth maps are produced once per image,
not per step.
"""

from __future__ import annotations

from typing import Callable, Optional, Protocol, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DepthEstimator",
    "SobelDepthEstimator",
    "TorchHubMidasEstimator",
    "AdaBinsEstimator",
    "LeResEstimator",
    "DepthManager",
    "create_depth_mask",
    "build_depth_mask",
    "get_depth",
    "double_estimate",
    "merge_depth",
    "boost_depth",
    "generate_patches",
    "adaptive_select",
    "grid_patches",
    "calculate_processing_res",
    "rescale",
    "shave",
]


class DepthEstimator(Protocol):
    def estimate(self, img: np.ndarray) -> np.ndarray:
        """uint8/float [H, W, 3] image -> depth [H, W] (near = larger)."""
        ...


class SobelDepthEstimator:
    """Offline fallback: pseudo-depth from blurred luminance + vertical
    position prior (near objects tend to be lower and high-contrast). Not a
    real monocular model — a deterministic stand-in that keeps the whole
    depth-conditioning path testable without downloads."""

    def estimate(self, img: np.ndarray) -> np.ndarray:
        img = np.asarray(img, np.float32)
        if img.max() > 2.0:
            img = img / 255.0
        grey = img.mean(axis=-1)
        h, w = grey.shape
        # vertical prior: bottom of frame nearer
        prior = np.linspace(0.0, 1.0, h)[:, None] * np.ones((1, w))
        # local contrast via gradient magnitude (box-blurred)
        gy, gx = np.gradient(grey)
        mag = np.sqrt(gx**2 + gy**2)
        k = max(3, min(h, w) // 16)
        kernel = np.ones(k) / k
        mag = np.apply_along_axis(
            lambda r: np.convolve(r, kernel, mode="same"), 1, mag
        )
        mag = np.apply_along_axis(
            lambda c: np.convolve(c, kernel, mode="same"), 0, mag
        )
        d = 0.6 * prior + 0.4 * (mag / (mag.max() + 1e-8))
        return d.astype(np.float32)


class TorchHubMidasEstimator:
    """MiDaS DPT via torch.hub (requires network / local hub cache).
    Applies the reference's alignment transform (50 - d) / 19
    (depth.py:150-152)."""

    def __init__(self, model_type: str = "DPT_Large"):
        import torch

        self.torch = torch
        self.model = torch.hub.load("intel-isl/MiDaS", model_type)
        transforms = torch.hub.load("intel-isl/MiDaS", "transforms")
        self.transform = (
            transforms.dpt_transform
            if "DPT" in model_type
            else transforms.small_transform
        )
        self.model.eval()

    def estimate(self, img: np.ndarray) -> np.ndarray:
        torch = self.torch
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        with torch.no_grad():
            batch = self.transform(img)
            pred = self.model(batch)
            pred = torch.nn.functional.interpolate(
                pred.unsqueeze(1), size=img.shape[:2],
                mode="bicubic", align_corners=False,
            ).squeeze()
        depth = pred.cpu().numpy()
        return ((50.0 - depth) / 19.0).astype(np.float32)


class AdaBinsEstimator:
    """AdaBins monocular depth adapter (reference depth.py:74-76 load,
    :85-125 apply_adabins). Weights-gated like MiDaS: pass a loaded AdaBins
    ``InferenceHelper``-style model (anything with
    ``predict_pil(pil_image) -> (bin_centers, depth)``), or leave ``model``
    None to import ``infer.InferenceHelper`` from an AdaBins checkout on
    sys.path.

    Reproduces the reference's resize contract: images above
    MAX_ADABINS_AREA (500000 px) are downscaled, below MIN_ADABINS_AREA
    (448^2) upscaled, prediction bicubic-resized back to the source size
    (depth.py:92-117)."""

    MAX_AREA = 500_000
    MIN_AREA = 448 * 448

    def __init__(self, model=None, dataset: str = "nyu"):
        if model is None:
            from infer import InferenceHelper  # the AdaBins repo module

            model = InferenceHelper(dataset=dataset, device="cpu")
        self.model = model

    def estimate(self, img: np.ndarray) -> np.ndarray:
        from PIL import Image

        img = np.asarray(img)
        if img.dtype != np.uint8:
            scale = 255.0 if img.max() <= 2.0 else 1.0
            img = np.clip(img * scale, 0, 255).astype(np.uint8)
        h, w = img.shape[:2]
        area = h * w
        pil = Image.fromarray(img)
        if area > self.MAX_AREA:
            s = (self.MAX_AREA / area) ** 0.5
            pil = pil.resize((int(w * s), int(h * s)), Image.LANCZOS)
        elif area < self.MIN_AREA:
            s = (self.MIN_AREA / area) ** 0.5
            pil = pil.resize((int(w * s), int(h * s)), Image.BICUBIC)
        _, depth = self.model.predict_pil(pil)
        depth = np.asarray(depth, np.float32)
        depth = depth.reshape(depth.shape[-2], depth.shape[-1])
        if depth.shape != (h, w):
            depth = _resize(depth, (h, w))
        return depth.astype(np.float32)


class LeResEstimator:
    """LeReS relative-depth adapter (reference depth.py:77-83 load,
    :160-178 apply_leres). Pass a loaded model exposing
    ``inference(img_chw_tensor) -> depth`` (the LeReS ``RelDepthModel``
    interface), or leave ``model`` None to import it from a LeReS checkout
    on sys.path (weights-gated; no downloads here).

    Contract preserved: input resized to 448x448, ImageNet-normalized
    CHW tensor, prediction resized back to the source resolution."""

    IMAGENET_MEAN = (0.485, 0.456, 0.406)
    IMAGENET_STD = (0.229, 0.224, 0.225)

    def __init__(self, model=None, backbone: str = "resnext101"):
        if model is None:
            from lib.multi_depth_model_woauxi import RelDepthModel

            model = RelDepthModel(backbone=backbone)
            model.eval()
        self.model = model

    def estimate(self, img: np.ndarray) -> np.ndarray:
        import torch

        img = np.asarray(img, np.float32)
        if img.max() > 2.0:
            img = img / 255.0
        h, w = img.shape[:2]
        small = _resize(img, (448, 448, img.shape[-1]))
        mean = np.asarray(self.IMAGENET_MEAN, np.float32)
        std = np.asarray(self.IMAGENET_STD, np.float32)
        small = (small - mean) / std
        chw = torch.from_numpy(
            np.ascontiguousarray(small.transpose(2, 0, 1), )
        ).float()[None]
        with torch.no_grad():
            pred = self.model.inference(chw)
        depth = np.asarray(pred.detach().cpu().numpy(), np.float32)
        depth = depth.reshape(depth.shape[-2], depth.shape[-1])
        if depth.shape != (h, w):
            depth = _resize(depth, (h, w))
        return depth.astype(np.float32)


def rescale(x):
    """(x - min) / (max - min) (depth.py:236-237)."""
    return (x - x.min()) / (x.max() - x.min() + 1e-12)


def shave(x, q: float):
    """Zero out the lowest quantile (depth.py:238-240)."""
    x = np.array(x, np.float32, copy=True)
    v = np.quantile(x, q, axis=-1, keepdims=True)
    x[x < v] = 0.0
    return x


def create_depth_mask(depth_map: np.ndarray, size: Tuple[int, int] = (64, 64)):
    """Depth map [H, W] -> mask [h, w] in [-1, 1]: bicubic resize then
    min/max rescale (depth.py:204-222). This is the 5th-channel UNet
    conditioning input for depth2img (v2-midas-inference.yaml)."""
    d = jnp.asarray(depth_map, jnp.float32)
    sized = jax.image.resize(d, size, method="bicubic")
    lo, hi = jnp.min(sized), jnp.max(sized)
    return np.asarray(2.0 * (sized - lo) / (hi - lo + 1e-12) - 1.0)


def build_depth_mask(
    img: np.ndarray,
    estimator: Optional[DepthEstimator] = None,
    q: float = 0.35,
    size: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Image -> spatial mask with 1 nearest (depth.py:223-240): 1 - depth
    mask, lowest-``q``-quantile shaved to 0, rescaled to [0, 1]."""
    estimator = estimator or SobelDepthEstimator()
    depth = estimator.estimate(img)
    if size is None:
        size = (depth.shape[0] // 8, depth.shape[1] // 8)
    mask = 1.0 - create_depth_mask(depth, size=size)
    return rescale(shave(mask, q))


def get_depth(
    img: np.ndarray,
    estimators: Tuple[DepthEstimator, ...],
    weights: Optional[Tuple[float, ...]] = None,
) -> np.ndarray:
    """Blend multiple depth estimates (depth.py:189-198 blends MiDaS and
    AdaBins with midas_weight)."""
    if weights is None:
        weights = tuple([1.0 / len(estimators)] * len(estimators))
    out = None
    for est, w in zip(estimators, weights):
        d = est.estimate(img)
        out = d * w if out is None else out + d * w
    return out


class DepthManager:
    """Reference DepthManager/MidasDepthManager (depth.py:242-326) with a
    pluggable estimator."""

    def __init__(
        self,
        estimator: Optional[DepthEstimator] = None,
        q: float = 0.0,
        size: Tuple[int, int] = (64, 64),
    ):
        self.estimator = estimator or SobelDepthEstimator()
        self.q = q
        self.size = size

    def apply_depth(self, img) -> np.ndarray:
        return self.estimator.estimate(img)

    def get(self, img) -> np.ndarray:
        mask = 1.0 - create_depth_mask(self.apply_depth(img), size=self.size)
        return rescale(shave(mask, self.q))

    def conditioning_channel(self, img) -> jax.Array:
        """[h, w, 1] depth channel for the depth2img UNet (concatenated to
        the latent before factor tiling; ddim.py:274-276)."""
        d = create_depth_mask(self.apply_depth(img), size=self.size)
        return jnp.asarray(d)[..., None]


# --------------------------------------------------------------------------
# Boosted depth (two-resolution merging; depth.py:339-594)
# --------------------------------------------------------------------------


def _resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    return np.asarray(
        jax.image.resize(jnp.asarray(img, jnp.float32), size, method="bicubic")
    )


def merge_depth(
    low_res: np.ndarray,
    high_res: np.ndarray,
    merge_size: int = 1024,
    merge_model: Optional[Callable] = None,
) -> np.ndarray:
    """Merge a coarse and a fine depth estimate (global_merge,
    depth.py:339-380). With a merge model (the reference's pix2pix net):
    normalized inputs -> model -> [0,1] rescale. Without: frequency blend —
    the low-res estimate provides the base, the high-res one the detail
    residual (high minus its own blur)."""
    e1 = rescale(_resize(low_res, (merge_size, merge_size)))
    e2 = rescale(_resize(high_res, (merge_size, merge_size)))
    if merge_model is not None:
        out = merge_model(e1, e2)
        out = (np.asarray(out) + 1.0) / 2.0
        return rescale(out)
    # frequency blend fallback
    blur = _resize(_resize(e2, (merge_size // 8, merge_size // 8)), (merge_size, merge_size))
    detail = e2 - blur
    return rescale(e1 + detail)


def double_estimate(
    img: np.ndarray,
    estimator: DepthEstimator,
    size1: int,
    size2: int,
    merge_size: int = 1024,
    merge_model: Optional[Callable] = None,
) -> np.ndarray:
    """Estimate at two resolutions and merge (doubleestimate,
    depth.py:489-516)."""
    img = np.asarray(img, np.float32)

    def resize_img(n):
        shape = (n, n) if img.ndim == 2 else (n, n, img.shape[-1])
        return np.asarray(
            jax.image.resize(jnp.asarray(img), shape, method="bicubic")
        )

    e1 = estimator.estimate(resize_img(size1))
    e2 = estimator.estimate(resize_img(size2))
    return merge_depth(e1, e2, merge_size=merge_size, merge_model=merge_model)


# --------------------------------------------------------------------------
# Patch-based local boosting (BoostingMonocularDepth; depth.py:513-594,
# util.py:66-155). Gradient-dense regions get re-estimated at patch
# resolution and blended back into the whole-image base estimate.
# --------------------------------------------------------------------------


def _rgb2gray(rgb: np.ndarray) -> np.ndarray:
    """util.py:75-77 luma weights."""
    if rgb.ndim == 2:
        return np.asarray(rgb, np.float64)
    return np.dot(rgb[..., :3], [0.2989, 0.5870, 0.1140])


def _sobel_grad(gray: np.ndarray) -> np.ndarray:
    """|d/dy| + |d/dx| via 3x3 Sobel (generatepatchs, depth.py:566-568)."""
    g = np.pad(np.asarray(gray, np.float64), 1, mode="edge")
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64)
    out = np.zeros_like(gray, np.float64)
    h, w = gray.shape
    gx = np.zeros_like(out)
    gy = np.zeros_like(out)
    for dy in range(3):
        for dx in range(3):
            win = g[dy : dy + h, dx : dx + w]
            gx += kx[dy, dx] * win
            gy += kx.T[dy, dx] * win
    return np.abs(gx) + np.abs(gy)


def _integral(img: np.ndarray) -> np.ndarray:
    """Summed-area table with the cv2.integral zero border."""
    s = np.cumsum(np.cumsum(np.asarray(img, np.float64), 0), 1)
    return np.pad(s, ((1, 0), (1, 0)))


def _rect_sum(integral: np.ndarray, rect) -> float:
    """Gradient mass inside rect [x, y, w, h] (getGF_fromintegral,
    util.py:66-73)."""
    x, y, w, h = rect
    return float(
        integral[y + h, x + w] - integral[y, x + w]
        - integral[y + h, x] + integral[y, x]
    )


def grid_patches(shape: Tuple[int, int], blsize: int, stride: int):
    """Initial overlapping grid of square rects [x, y, w, h]
    (applyGridpatch, util.py:136-148)."""
    hgt, wdt = shape
    rects = []
    for x in range(blsize, wdt - blsize, stride):
        for y in range(blsize, hgt - blsize, stride):
            rects.append([x - blsize, y - blsize, 2 * blsize, 2 * blsize])
    return rects


def adaptive_select(integral_grad: np.ndarray, rects, gf: float, factor: float):
    """Keep gradient-dense patches, growing each until its density drops to
    the whole-image density (adaptiveselection, depth.py:513-562)."""
    height, width = integral_grad.shape[0] - 1, integral_grad.shape[1] - 1
    step = int(32 / factor)
    out = []
    for rect in rects:
        bbox = list(rect)
        if _rect_sum(integral_grad, bbox) / (bbox[2] * bbox[3]) < gf:
            continue
        while True:
            test = [
                bbox[0] - step // 2, bbox[1] - step // 2,
                bbox[2] + step, bbox[3] + step,
            ]
            if (
                test[0] < 0 or test[1] < 0
                or test[1] + test[3] >= height or test[0] + test[2] >= width
            ):
                break
            if _rect_sum(integral_grad, test) / (test[2] * test[3]) < gf:
                break
            bbox = test
        out.append(bbox)
    return out


def generate_patches(img: np.ndarray, base_size: int, factor: float = 1.0):
    """Gradient-guided patch proposal (generatepatchs, depth.py:564-594):
    Sobel edge mass -> threshold at its mean -> integral image -> grid ->
    adaptive growth -> biggest-first ordering."""
    grad = _sobel_grad(_rgb2gray(img))
    nz = grad[grad > 0]
    if nz.size:
        grad[grad < nz.mean()] = 0
    gf = grad.sum() / grad.size
    integral = _integral(grad)
    blsize = int(round(base_size / 2))
    stride = int(round(blsize * 0.75))
    rects = grid_patches(img.shape[:2], blsize, stride)
    sel = adaptive_select(integral, rects, gf, factor)
    return sorted(sel, key=lambda r: r[2], reverse=True)


def _blend_mask(h: int, w: int) -> np.ndarray:
    """Smooth borders-to-zero blending window (util.py generatemask)."""
    y = np.minimum(np.arange(h), np.arange(h)[::-1]) / max(h / 6.0, 1)
    x = np.minimum(np.arange(w), np.arange(w)[::-1]) / max(w / 6.0, 1)
    return np.clip(y[:, None], 0, 1) * np.clip(x[None, :], 0, 1)


def boost_depth(
    img: np.ndarray,
    estimator: DepthEstimator,
    *,
    base_size: int = 384,
    max_patches: int = 16,
    merge_model: Optional[Callable] = None,
    auto_res: bool = False,
) -> np.ndarray:
    """Whole-image double estimate, then per-patch re-estimation merged back
    (the reference's local boosting loop, depth.py:648-700): each selected
    patch is double-estimated, scale/shift-fit to the base estimate
    (least-squares, replacing the reference's pix2pix merge net when
    ``merge_model`` is None), and blended in with a smooth window.
    ``auto_res=True`` picks the high-resolution estimation size with the
    R_x search (depth.py:611-620) instead of the fixed 2*base_size."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    size2 = 2 * base_size
    if auto_res:
        optimal, _ = calculate_processing_res(img, base_size)
        size2 = max(size2, optimal)
    base = double_estimate(
        img, estimator, base_size, size2, merge_model=merge_model
    )
    base = _resize(base, (h, w))
    patches = generate_patches(img, min(2 * base_size, min(h, w)))[:max_patches]
    updated = base.copy()
    for x, y, pw, ph in patches:
        patch_rgb = img[y : y + ph, x : x + pw]
        est = double_estimate(
            patch_rgb, estimator, base_size, 2 * base_size,
            merge_model=merge_model,
        )
        est = _resize(est, (ph, pw))
        region = updated[y : y + ph, x : x + pw]
        # least-squares scale/shift onto the current estimate
        a, b = np.polyfit(est.reshape(-1), region.reshape(-1), 1)
        mapped = a * est + b
        m = _blend_mask(ph, pw)
        updated[y : y + ph, x : x + pw] = m * mapped + (1 - m) * region
    return rescale(updated)


def _max_pool(img: np.ndarray, n: int) -> np.ndarray:
    """Block-reduce by max with block size n (util.py:27-32)."""
    n = max(int(n), 1)
    h, w = img.shape
    ph, pw = -h % n, -w % n
    p = np.pad(img, ((0, ph), (0, pw)), constant_values=-np.inf)
    return p.reshape((h + ph) // n, n, (w + pw) // n, n).max(axis=(1, 3))


def _dilate(binary: np.ndarray, k: int) -> np.ndarray:
    """Binary dilation with a k x k ones kernel (cv2.dilate equivalent)."""
    k = max(int(k), 1)
    if k == 1:
        return binary
    from scipy.ndimage import maximum_filter

    return maximum_filter(binary, size=k, mode="constant", cval=0.0)


def calculate_processing_res(
    img: np.ndarray,
    base_size: int = 384,
    confidence: float = 0.1,
    scale_threshold: float = 3.0,
    whole_size_threshold: int = 3000,
) -> Tuple[int, float]:
    """R_x resolution search (calculateprocessingres, util.py:79-133): grow
    the working resolution until more than ``confidence`` of pixels fall
    outside any edge's receptive field. Returns (optimal_size, patch_scale
    [the K parameter])."""
    speed_scale = 32
    image_dim = int(min(img.shape[:2]))

    grad = _sobel_grad(_rgb2gray(img))
    grad = _resize(grad, (image_dim, image_dim))
    m, mx = grad.min(), grad.max()
    middle = m + 0.4 * (mx - m)
    grad = (grad >= middle).astype(np.float64)

    kernel = int(base_size / speed_scale)
    kernel2 = max(int(base_size / (4 * speed_scale)), 1)
    threshold = min(whole_size_threshold, scale_threshold * max(img.shape[:2]))

    outputsize_scale = base_size / speed_scale
    grad_resized = grad
    for p_size in range(
        int(base_size / speed_scale),
        int(threshold / speed_scale),
        max(int(base_size / (2 * speed_scale)), 1),
    ):
        pooled = _max_pool(grad, int(np.floor(image_dim / p_size)))
        grad_resized = (_resize(pooled, (p_size, p_size)) >= 0.5).astype(np.float64)
        dilated = _dilate(grad_resized, kernel)
        if (1.0 - dilated).mean() > confidence:
            break
        outputsize_scale = p_size

    patch_scale = float(_dilate(grad_resized, kernel2).mean())
    return int(outputsize_scale * speed_scale), patch_scale
