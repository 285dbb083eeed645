"""Fused on-device image preprocessing.

Replaces the reference's host-side albumentations pipeline
(Resize(540,960) + Normalize + ToTensor, coordinate_model.py:62-64) and
ultralytics' letterbox.  Frames arrive as uint8 NHWC batches; resize is
expressed as two dense interpolation matmuls (static shapes, MXU) and
normalization fuses into the same elementwise pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@functools.lru_cache(maxsize=64)
def _interp_matrix_half_pixel(out_size: int, in_size: int) -> np.ndarray:
    """1-D linear interpolation matrix with the half-pixel (OpenCV
    INTER_LINEAR / align_corners=False) convention, clamped at borders."""
    M = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        M[:, 0] = 1.0
        return M
    scale = in_size / out_size
    for o in range(out_size):
        pos = (o + 0.5) * scale - 0.5
        pos = min(max(pos, 0.0), in_size - 1.0)
        lo = int(np.floor(pos))
        hi = min(lo + 1, in_size - 1)
        frac = pos - lo
        M[o, lo] += 1.0 - frac
        M[o, hi] += frac
    return M


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """cv2.INTER_LINEAR-compatible resize of an NHWC batch (any float or
    uint8 input; returns float32)."""
    Ho, Wo = out_hw
    _, Hi, Wi, _ = x.shape
    x = x.astype(jnp.float32)
    if (Hi, Wi) == (Ho, Wo):
        return x
    Mh = jnp.asarray(_interp_matrix_half_pixel(Ho, Hi))
    Mw = jnp.asarray(_interp_matrix_half_pixel(Wo, Wi))
    y = jnp.einsum("oh,nhwc->nowc", Mh, x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("ow,nhwc->nhoc", Mw, y, precision=jax.lax.Precision.HIGHEST)
    return y


@functools.partial(jax.jit, static_argnames=("out_hw", "bgr_to_rgb"))
def preprocess_keypoint(frames: jax.Array, out_hw: tuple[int, int] = (540, 960), bgr_to_rgb: bool = True) -> jax.Array:
    """uint8 BGR NHWC frames -> ImageNet-normalized float32 at ``out_hw``.

    Matches the reference transform chain exactly: BGR->RGB
    (coordinate_model.py:221), cv2 bilinear resize to 540x960, then
    (x - 255*mean) / (255*std) (albumentations Normalize defaults).
    """
    if bgr_to_rgb:
        frames = frames[..., ::-1]
    x = resize_bilinear(frames, out_hw)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return (x - mean) / std


def compute_work_geometry(orig_hw: tuple[int, int], size: int, stride: int = 32):
    """Rectangular-letterbox geometry for host prescaling (ultralytics
    LetterBox(auto=True), the reference's .pt predict path): scale to fit
    ``size`` keeping aspect, pad each dimension up to the next /``stride``
    multiple, centered with the +-0.1 rounding quirk.

    Returns an :class:`eagle_tpu.config.WorkGeometry` (enabled)."""
    from eagle_tpu.config import WorkGeometry

    h, w = orig_hw
    gain = min(size / h, size / w)
    img_h, img_w = round(h * gain), round(w * gain)
    pad_h = (-img_h) % stride
    pad_w = (-img_w) % stride
    top = int(round(pad_h / 2 - 0.1))
    left = int(round(pad_w / 2 - 0.1))
    return WorkGeometry(
        enabled=True,
        gain=gain,
        pad_x=left,
        pad_y=top,
        img_h=img_h,
        img_w=img_w,
        canvas_h=img_h + pad_h,
        canvas_w=img_w + pad_w,
        orig_h=h,
        orig_w=w,
    )


def host_letterbox(frames: np.ndarray, geom, threads: int | None = None) -> np.ndarray:
    """Prescale BGR uint8 frames (N, H, W, 3) to the working canvas on the
    host with cv2 INTER_LINEAR (bit-identical to both the reference's
    keypoint Resize and ultralytics' letterbox resize).  This is the single
    host->device buffer the whole device pipeline consumes.

    Threading only pays on multi-core hosts (cv2.resize releases the GIL);
    on a single core the pool is pure overhead (~8x, measured)."""
    import os

    import cv2

    n = len(frames)
    out = np.full((n, geom.canvas_h, geom.canvas_w, 3), 114, np.uint8)
    y0, x0 = geom.pad_y, geom.pad_x

    def one(i):
        r = cv2.resize(
            frames[i], (geom.img_w, geom.img_h), interpolation=cv2.INTER_LINEAR
        )
        out[i, y0 : y0 + geom.img_h, x0 : x0 + geom.img_w] = r

    if threads is None:
        from eagle_tpu.utils import available_cpus

        threads = min(8, available_cpus())
    if threads > 1 and n >= 8:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(one, range(n)))
    else:
        for i in range(n):
            one(i)
    return out


@functools.partial(jax.jit, static_argnames=("size", "bgr_to_rgb"))
def letterbox(
    frames: jax.Array, size: int = 640, pad_value: float = 114.0, bgr_to_rgb: bool = True
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Ultralytics-style letterbox: scale to fit a square canvas keeping
    aspect ratio, center with gray padding.  Static output shapes (the
    input batch has one fixed H, W, so scale/padding are trace-time
    constants).

    Returns (images (N, size, size, 3) float32 in [0, 1], gain, pad_xy)
    where ``boxes_orig = (boxes_letterboxed - pad) / gain``.
    """
    n, h, w, _ = frames.shape
    gain = min(size / h, size / w)
    new_h, new_w = round(h * gain), round(w * gain)
    # ultralytics centers with symmetric padding, rounding +-0.1
    pad_w = (size - new_w) / 2
    pad_h = (size - new_h) / 2
    top, left = int(round(pad_h - 0.1)), int(round(pad_w - 0.1))

    if bgr_to_rgb:
        frames = frames[..., ::-1]
    resized = resize_bilinear(frames, (new_h, new_w))
    canvas = jnp.full((n, size, size, 3), pad_value, jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, top, left, 0))
    return canvas / 255.0, jnp.float32(gain), jnp.asarray([left, top], jnp.float32)


# ---------------------------------------------------------------------------
# 4:2:0 host->device frame transport
# ---------------------------------------------------------------------------


def resolve_upload_format(fmt: str, geom_enabled: bool) -> str:
    """Resolve ``PipelineConfig.upload_format`` to a concrete transport.

    One rule for every pipeline entry point (single-clip, multi-clip):
    "auto" means 4:2:0 on the working-resolution path, raw BGR otherwise;
    unknown values raise instead of silently diverging between paths."""
    if fmt == "auto":
        return "yuv420" if geom_enabled else "bgr"
    if fmt not in ("bgr", "yuv420"):
        raise ValueError(f"upload_format must be 'auto', 'bgr' or 'yuv420', got {fmt!r}")
    return fmt


def _native_prescale_enabled() -> bool:
    """The C++ prescale (native/prescale.cpp) is a byte-identical cv2
    clone, on by default when the toolchain can build it; set
    EAGLE_TPU_NATIVE_PRESCALE=0 to force the cv2 loops (A/B timing)."""
    import os

    if os.environ.get("EAGLE_TPU_NATIVE_PRESCALE", "1") == "0":
        return False
    from eagle_tpu import native

    return native.prescale_available()


def host_to_i420(frames_bgr: np.ndarray) -> np.ndarray:
    """BGR uint8 (N, H, W, 3) -> packed I420 planes (N, H*3//2, W) uint8
    (cv2 BGR2YUV_I420; requires even H, W).

    Broadcast video is natively 4:2:0, so shipping planes instead of BGR
    halves the host->device bytes without discarding information the
    source ever had; the device reconstructs BGR with the matching BT.601
    inverse (:func:`i420_to_bgr`, within 1 LSB of cv2's own YUV2BGR_I420).

    Runs the native fused kernel when available (byte-identical, pinned by
    tests/test_native_prescale.py), else per-frame cv2.
    """
    n, h, w, _ = frames_bgr.shape
    # h % 4: the (N, H*3//2, W) packing stores each chroma plane as H//4
    # rows of width W, which only tiles exactly when H % 4 == 0 (cv2 packs
    # fractional rows otherwise and the device-side reshape would mangle
    # the planes)
    assert h % 4 == 0 and w % 2 == 0, (
        f"I420 packed-plane layout needs H % 4 == 0 and even W, got {h}x{w}"
    )
    if _native_prescale_enabled():
        from eagle_tpu import native

        return native.bgr_to_i420(frames_bgr)
    return _host_to_i420_cv2(frames_bgr)


def _host_to_i420_cv2(frames_bgr: np.ndarray) -> np.ndarray:
    """Per-frame cv2 fallback (and the native kernel's parity oracle)."""
    import cv2

    n, h, w, _ = frames_bgr.shape
    out = np.empty((n, h * 3 // 2, w), np.uint8)
    for i in range(n):
        out[i] = cv2.cvtColor(frames_bgr[i], cv2.COLOR_BGR2YUV_I420)
    return out


def _yuv_planes_to_bgr(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """(N, H, W) float32 Y + (N, H/2, W/2) float32 U/V -> BGR uint8.
    BT.601 video-range inverse with nearest chroma upsampling."""
    n, h, w = y.shape

    def up2(c):  # nearest 2x, gather-free
        c = jnp.broadcast_to(c[:, :, None, :, None], (n, h // 2, 2, w // 2, 2))
        return c.reshape(n, h, w)

    u = up2(u) - 128.0
    v = up2(v) - 128.0
    yv = (y - 16.0) * 1.164
    b = yv + 2.018 * u
    g = yv - 0.391 * u - 0.813 * v
    r = yv + 1.596 * v
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.round(bgr), 0.0, 255.0).astype(jnp.uint8)


@jax.jit
def i420_to_bgr(planes: jax.Array) -> jax.Array:
    """Packed I420 planes (N, H*3//2, W) uint8 -> BGR uint8 (N, H, W, 3).

    BT.601 video-range inverse with nearest chroma upsampling -- matches
    cv2.COLOR_YUV2BGR_I420 within 1 LSB (pinned by
    tests/test_work_geometry.py::test_i420_roundtrip)."""
    n, h15, w = planes.shape
    h = h15 * 2 // 3
    y = planes[:, :h].astype(jnp.float32)
    u = planes[:, h : h + h // 4].reshape(n, h // 2, w // 2).astype(jnp.float32)
    v = planes[:, h + h // 4 :].reshape(n, h // 2, w // 2).astype(jnp.float32)
    return _yuv_planes_to_bgr(y, u, v)


@functools.lru_cache(maxsize=1)
def _i420_pad_values() -> tuple[int, int]:
    """cv2's (Y, U=V) encoding of the BGR-114 letterbox gray."""
    import cv2

    patch = np.full((4, 4, 3), 114, np.uint8)
    yuv = cv2.cvtColor(patch, cv2.COLOR_BGR2YUV_I420)  # (6, 4)
    return int(yuv[0, 0]), int(yuv[4, 0])


def i420_geometry_ok(geom, frame_hw: tuple[int, int]) -> bool:
    """True when :func:`host_letterbox_i420` can place chroma exactly:
    every offset/extent must stay even at half resolution, and both
    heights must be multiples of 4 so the packed chroma planes tile into
    whole rows (see :func:`host_to_i420`)."""
    h, w = frame_hw
    return (
        geom.enabled
        and h % 4 == 0
        and w % 2 == 0
        and geom.canvas_h % 4 == 0
        and geom.canvas_w % 2 == 0
        and geom.img_h % 2 == 0
        and geom.img_w % 2 == 0
        and geom.pad_y % 2 == 0
        and geom.pad_x % 2 == 0
    )


@functools.partial(jax.jit, static_argnames=("geom",))
def device_letterbox_i420(planes: jax.Array, geom) -> jax.Array:
    """RAW-resolution packed I420 planes (N, H*3//2, W) -> working-canvas
    BGR uint8 (N, canvas_h, canvas_w, 3), entirely ON DEVICE: the
    ``PipelineConfig.prescale="device"`` mode.

    Mirrors :func:`host_letterbox_i420` (resize the Y/U/V planes onto
    114-gray-padded canvas planes with the INTER_LINEAR half-pixel
    convention, then invert BT.601) with the resize as f32 interp matmuls
    instead of cv2's fixed point -- within a couple of LSB of the host
    path.  The host's per-frame cost drops to the BGR->I420 conversion
    (1.08 vs 1.59 ms/frame measured -- the conversion, not the resize,
    dominates the host prescale) at ~1.8x the link bytes: the right
    trade when the host CPU rather than the link bounds throughput.
    Gate with :func:`i420_geometry_ok` on the RAW frame dims."""
    n, h15, w = planes.shape
    h = h15 * 2 // 3
    ih, iw = geom.img_h, geom.img_w
    py, px = geom.pad_y, geom.pad_x
    ch, cw = geom.canvas_h, geom.canvas_w
    y_pad, uv_pad = _i420_pad_values()

    y = planes[:, :h].astype(jnp.float32)
    u = planes[:, h : h + h // 4].reshape(n, h // 2, w // 2).astype(jnp.float32)
    v = planes[:, h + h // 4 :].reshape(n, h // 2, w // 2).astype(jnp.float32)

    def rs(p, hw):  # plane resize, rounded at the canvas like the host path
        r = resize_bilinear(p[..., None], hw)[..., 0]
        return jnp.clip(jnp.round(r), 0.0, 255.0)

    yc = jnp.full((n, ch, cw), float(y_pad), jnp.float32)
    yc = yc.at[:, py : py + ih, px : px + iw].set(rs(y, (ih, iw)))
    uc = jnp.full((n, ch // 2, cw // 2), float(uv_pad), jnp.float32)
    uc = uc.at[:, py // 2 : (py + ih) // 2, px // 2 : (px + iw) // 2].set(
        rs(u, (ih // 2, iw // 2))
    )
    vc = jnp.full((n, ch // 2, cw // 2), float(uv_pad), jnp.float32)
    vc = vc.at[:, py // 2 : (py + ih) // 2, px // 2 : (px + iw) // 2].set(
        rs(v, (ih // 2, iw // 2))
    )
    return _yuv_planes_to_bgr(yc, uc, vc)


def host_letterbox_i420(frames_bgr: np.ndarray, geom) -> np.ndarray:
    """Prescale straight in 4:2:0: convert each full frame once, then
    resize the Y/U/V planes onto the packed canvas planes.

    Equivalent to ``host_to_i420(host_letterbox(frames, geom))`` within a
    couple of LSB (convert and bilinear resize are both linear maps; only
    the rounding points and the chroma sampling grid differ), but ~30%
    cheaper on the host: the resize touches 1.5 bytes/px instead of 3 and
    the conversion runs once instead of per canvas.  Gate with
    :func:`i420_geometry_ok`.

    Runs the fused native kernel when available and the geometry is in its
    byte-identical envelope (downscale with img_w % 32 == 0 -- every
    working-resolution geometry; see native/prescale.cpp), else cv2."""
    n, h, w, _ = frames_bgr.shape
    if (
        geom.img_w % 32 == 0
        and geom.img_h <= h
        and geom.img_w <= w
        # the full documented i420_geometry_ok gate -- checked here too so
        # a mis-gated call (odd canvas/pad parity included) falls back to
        # cv2's loud reshape failure instead of silently mis-slicing
        # planes in the kernel
        and i420_geometry_ok(geom, (h, w))
        and _native_prescale_enabled()
    ):
        from eagle_tpu import native

        yp, uvp = _i420_pad_values()
        return native.letterbox_i420(frames_bgr, geom, yp, uvp)
    return _host_letterbox_i420_cv2(frames_bgr, geom)


def _host_letterbox_i420_cv2(frames_bgr: np.ndarray, geom) -> np.ndarray:
    """Per-frame cv2 fallback (and the native kernel's parity oracle)."""
    import cv2

    n, h, w, _ = frames_bgr.shape
    ch, cw = geom.canvas_h, geom.canvas_w
    y_pad, uv_pad = _i420_pad_values()
    out = np.empty((n, ch * 3 // 2, cw), np.uint8)
    ih, iw = geom.img_h, geom.img_w
    py, px = geom.pad_y, geom.pad_x
    for i in range(n):
        yuv = cv2.cvtColor(frames_bgr[i], cv2.COLOR_BGR2YUV_I420)
        y_full = yuv[:h]
        u_full = yuv[h : h + h // 4].reshape(h // 2, w // 2)
        v_full = yuv[h + h // 4 :].reshape(h // 2, w // 2)
        o = out[i]
        oy = o[:ch]
        oy[:] = y_pad
        oy[py : py + ih, px : px + iw] = cv2.resize(
            y_full, (iw, ih), interpolation=cv2.INTER_LINEAR
        )
        for plane_src, off in ((u_full, ch), (v_full, ch + ch // 4)):
            plane = o[off : off + ch // 4].reshape(ch // 2, cw // 2)
            plane[:] = uv_pad
            plane[py // 2 : (py + ih) // 2, px // 2 : (px + iw) // 2] = cv2.resize(
                plane_src, (iw // 2, ih // 2), interpolation=cv2.INTER_LINEAR
            )
    return out
