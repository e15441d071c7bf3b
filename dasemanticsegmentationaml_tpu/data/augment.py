"""On-device augmentation kernels (jittable, batched, jax.random-keyed).

The reference augments on host with torchvision-on-PIL transforms inside
DataLoader workers (reference GTAV.py:32-59):

  CS-HF : ColorJitter(contrast=[2,5]) -> ColorJitter(saturation=[1,3])
          -> RandomHorizontalFlip(p=1)
  H-RP  : ColorJitter(hue=0.2) -> RandomPerspective(p=1, distortion=0.5)
  B-GS-R: ColorJitter(brightness=[1,2]) -> Grayscale(3)
          -> RandomRotation(degrees=90)

each wrapped in RandomApply(p=0.5) (GTAV.py:51). Here they are device code:
the VPU does the color math, the warp is a fused gather, and every sample in
the batch gets its own fold-in key -- the host ships raw uint8 only.

Faithfulness notes:
* color ops follow the PIL/ImageEnhance float formulation (blend against
  black/mean/grayscale); PIL additionally truncates intermediates to uint8,
  a <1/255 deviation we accept (these feed training augmentation, not
  checkpoint-parity eval).
* the reference applies augmentation to the IMAGE ONLY, leaving labels
  unwarped and therefore misaligned under flip/perspective/rotation
  (reference GTAV.py:87-89; SURVEY.md section 4 bug 5). ``augment_labels``
  toggles the corrected behavior (geometric ops mirrored onto labels with
  nearest sampling and ignore-fill 255).
* RandomPerspective corner sampling reproduces torchvision's integer-uniform
  distribution; RandomRotation uses NEAREST and RandomPerspective BILINEAR
  (torchvision defaults the reference relies on).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_FILL = 255.0


# ------------------------------------------------------------- color ops
def rgb_to_grayscale(img: jax.Array) -> jax.Array:
    """ITU-R 601-2 luma (PIL convert('L') weights). img float [0,255] HWC."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return r * (299 / 1000) + g * (587 / 1000) + b * (114 / 1000)


def pil_luma(img: jax.Array) -> jax.Array:
    """Pillow convert('L') EXACTLY: integer (19595 R + 38470 G + 7471 B
    + 0x8000) >> 16 (augment_pil_exact.luma, validated over the full RGB
    cube). img float HWC with uint8-origin integer values; returns float
    integer values."""
    i = img.astype(jnp.int32)
    l_int = (i[..., 0] * 19595 + i[..., 1] * 38470 + i[..., 2] * 7471
             + 0x8000) >> 16
    return l_int.astype(jnp.float32)


def _clip(img: jax.Array) -> jax.Array:
    return jnp.clip(img, 0.0, 255.0)


def _pil_blend(degenerate, img: jax.Array, factor) -> jax.Array:
    """Image.blend semantics on uint8-valued floats: float32
    ``degenerate + factor*(img - degenerate)``, clipped, TRUNCATED
    (Pillow Blend.c casts; see augment_pil_exact._blend)."""
    f = jnp.float32(factor)
    d = jnp.asarray(degenerate, jnp.float32)
    t = d + f * (img.astype(jnp.float32) - d)
    return jnp.trunc(_clip(t))


def adjust_brightness(img: jax.Array, factor: jax.Array,
                      pil_exact: bool = False) -> jax.Array:
    if pil_exact:
        return _pil_blend(0.0, img, factor)
    return _clip(img * factor)


def adjust_contrast(img: jax.Array, factor: jax.Array,
                    pil_exact: bool = False) -> jax.Array:
    if pil_exact:
        # ImageStat's int(mean(L)+0.5) in exact integer math:
        # floor(s/n + 0.5) == (2s+n)//(2n)
        l_int = pil_luma(img).astype(jnp.int32)
        n = l_int.size
        # 2*s+n is computed in int32 on device (TPU jit has no int64 by
        # default): exact only while 2*255*n + n < 2^31. Shapes are static
        # at trace time, so oversize images fail LOUDLY here instead of
        # silently wrapping; use augment_pil_exact.adjust_contrast (int64
        # host path) for such images.
        if 511 * n >= 2**31:
            raise ValueError(
                f"adjust_contrast(pil_exact=True): {n} pixels would "
                f"overflow the int32 luma sum (limit ~4.2M); use the host "
                f"augment_pil_exact path for images this large")
        s = jnp.sum(l_int)
        mean = (2 * s + n) // (2 * n)
        return _pil_blend(mean.astype(jnp.float32), img, factor)
    # float formulation: blend against the float mean of the L channel
    mean = jnp.mean(rgb_to_grayscale(img))
    return _clip((img - mean) * factor + mean)


def adjust_saturation(img: jax.Array, factor: jax.Array,
                      pil_exact: bool = False) -> jax.Array:
    if pil_exact:
        return _pil_blend(pil_luma(img)[..., None], img, factor)
    gray = rgb_to_grayscale(img)[..., None]
    return _clip((img - gray) * factor + gray)


def adjust_hue(img: jax.Array, hue_shift: jax.Array) -> jax.Array:
    """hue_shift in [-0.5, 0.5] (fraction of the hue circle)."""
    x = img / 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    c = maxc - minc
    safe_c = jnp.where(c == 0, 1.0, c)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(c == 0, 0.0, (h / 6.0) % 1.0)
    s = jnp.where(maxc == 0, 0.0, c / jnp.where(maxc == 0, 1.0, maxc))

    h = (h + hue_shift) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # select chains instead of jnp.choose: choose lowers to a gather-like
    # program on TPU (measured 235 ms per 8x512x1024 batch vs ~10 ms here)
    def pick(opts):
        out = opts[5]
        for k in range(4, -1, -1):
            out = jnp.where(i == k, opts[k], out)
        return out

    r2 = pick([v, q, p, p, t, v])
    g2 = pick([t, v, v, q, p, p])
    b2 = pick([p, p, t, v, v, q])
    return _clip(jnp.stack([r2, g2, b2], axis=-1) * 255.0)


def adjust_hue_pil(img: jax.Array, hue_shift_u8: int) -> jax.Array:
    """torchvision-on-PIL adjust_hue's STRUCTURE on device: quantize to
    the uint8 HSV planes (Pillow Convert.c rgb2hsv), shift H by an integer
    with uint8 wraparound, convert back (hsv2rgb with C round()). Matches
    augment_pil_exact.adjust_hue except at float32-vs-float64 quantizer
    ties (Pillow mixes double in two spots we can't reproduce on a
    float32-only device) — the golden test measures that envelope
    (off-by-one lsb on a sub-percent pixel fraction).

    hue_shift_u8: integer shift of the H plane, from
    augment_pil_exact.hue_shift_u8(hue_factor) — a STATIC host int.
    """
    i = img.astype(jnp.int32)
    r, g, b = i[..., 0], i[..., 1], i[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    uv = maxc - minc
    gray = uv == 0
    cr = jnp.where(gray, 1, uv).astype(jnp.float32)
    maxf = jnp.where(maxc == 0, 1, maxc).astype(jnp.float32)
    s32 = uv.astype(jnp.float32) / maxf
    s_q = jnp.floor(s32 * 255.0)
    rc = (maxc - r).astype(jnp.float32) / cr
    gc = (maxc - g).astype(jnp.float32) / cr
    bc = (maxc - b).astype(jnp.float32) / cr
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.mod(h / 6.0 + 1.0, 1.0)
    h_q = jnp.floor(h * 255.0).astype(jnp.int32)
    h_q = jnp.where(gray, 0, h_q)
    s_q = jnp.where(gray, 0.0, s_q)

    h_shifted = (h_q + int(hue_shift_u8)) % 256

    # hsv2rgb (Pillow Convert.c): i = floor(h*6/255); p/q/t = round(...)
    x = h_shifted.astype(jnp.float32) * 6.0 / 255.0
    sector = jnp.floor(x).astype(jnp.int32)
    f = x - jnp.floor(x)
    fs = s_q / 255.0
    v = maxc.astype(jnp.float32)
    # C round() is half-away-from-zero; operands are >= 0 -> floor(v+0.5)
    p = jnp.floor(v * (1.0 - fs) + 0.5)
    q = jnp.floor(v * (1.0 - fs * f) + 0.5)
    t = jnp.floor(v * (1.0 - fs * (1.0 - f)) + 0.5)
    sector = sector % 6

    def pick(opts):
        out = opts[5]
        for k in range(4, -1, -1):
            out = jnp.where(sector == k, opts[k], out)
        return out

    r2 = pick([v, q, p, p, t, v])
    g2 = pick([t, v, v, q, p, p])
    b2 = pick([p, p, t, v, v, q])
    out = jnp.stack([r2, g2, b2], axis=-1)
    return jnp.where(gray[..., None], maxc.astype(jnp.float32)[..., None],
                     out)


def to_grayscale3(img: jax.Array, pil_exact: bool = False) -> jax.Array:
    gray = pil_luma(img) if pil_exact else rgb_to_grayscale(img)
    return jnp.repeat(gray[..., None], 3, axis=-1)


def hflip(img: jax.Array) -> jax.Array:
    return img[:, ::-1, ...]


# -------------------------------------------------------------- geometry
def perspective_coeffs(src_pts: jax.Array, dst_pts: jax.Array) -> jax.Array:
    """8 coeffs (a..h) of the homography mapping dst (x,y) -> src (x,y).

    Same linear system torchvision/PIL solve (_get_perspective_coeffs):
    src_x = (a x + b y + c) / (g x + h y + 1), analogous for y.
    src_pts/dst_pts: (4, 2) float (x, y) order.
    """
    rows = []
    rhs = []
    for k in range(4):
        x, y = dst_pts[k, 0], dst_pts[k, 1]
        X, Y = src_pts[k, 0], src_pts[k, 1]
        rows.append(jnp.stack([x, y, jnp.ones(()), jnp.zeros(()),
                               jnp.zeros(()), jnp.zeros(()),
                               -x * X, -y * X]))
        rhs.append(X)
        rows.append(jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
                               x, y, jnp.ones(()), -x * Y, -y * Y]))
        rhs.append(Y)
    A = jnp.stack(rows)
    b = jnp.stack(rhs)
    return jnp.linalg.solve(A, b)


def _source_coords(h: int, w: int, coeffs: jax.Array):
    """Continuous source coordinates for every output pixel (PIL convention:
    evaluate the inverse map at pixel centers +0.5, shift back -0.5)."""
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    a, b, c, d, e, f, g, hh = [coeffs[i] for i in range(8)]
    den = g * xx + hh * yy + 1.0
    sx = (a * xx + b * yy + c) / den - 0.5
    sy = (d * xx + e * yy + f) / den - 0.5
    return sx, sy


def _gather_bilinear(img: jax.Array, x0i, y0i, wx, wy) -> jax.Array:
    """Blend the 4 bilinear taps at (edge-clamped) integer corners with
    fractional weights. Gather all four taps with ONE flat gather: stack
    the (x+1), (y+1), (x+1,y+1) shifts on the channel axis so the tap
    neighborhood lives in the gathered row. 4 separate 2D gathers
    measured 6.6 s per 8-image batch; this form is ~40x faster."""
    h, w, ch = img.shape
    # bf16 gather rows are ~30% faster than fp32 and exact for
    # uint8-origin pixel values (integers <= 255 fit bf16's mantissa);
    # for already-jittered float pixels the 2^-8 rounding is far below
    # augmentation noise.
    f = img.astype(jnp.bfloat16)
    right = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    down = jnp.concatenate([f[1:], f[-1:]], axis=0)
    downright = jnp.concatenate([right[1:], right[-1:]], axis=0)
    stack = jnp.concatenate([f, right, down, downright], axis=-1)
    flat = stack.reshape(h * w, 4 * ch)
    idx = (y0i * w + x0i).reshape(-1)
    g = jnp.take(flat, idx, axis=0).reshape(h, w, 4, ch)
    g = g.astype(jnp.float32)
    top = g[..., 0, :] * (1 - wx)[..., None] + g[..., 1, :] * wx[..., None]
    bot = g[..., 2, :] * (1 - wx)[..., None] + g[..., 3, :] * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def warp(img: jax.Array, coeffs: jax.Array, mode: str = "bilinear",
         fill: float = 0.0) -> jax.Array:
    """Inverse-warp an HWC (or HW) image by homography coeffs (dst->src)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ = img.shape
    sx, sy = _source_coords(h, w, coeffs)
    # half-open upper bound: sx == w-0.5 exactly is OOB in Pillow
    oob = (sx < -0.5) | (sx >= w - 0.5) | (sy < -0.5) | (sy >= h - 0.5)

    if mode == "nearest":
        ix = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
        # one flat-index gather: a 2D advanced-index gather lowers ~40x
        # slower on TPU (measured 6.6 s vs 160 ms per 8x512x1024x3 batch)
        out = jnp.take(img.reshape(h * w, img.shape[-1]),
                       (iy * w + ix).reshape(-1), axis=0).reshape(
                           h, w, img.shape[-1])
    else:
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        # low-edge clamp: for x0 == -1 (source in [-0.5, 0)) BOTH taps are
        # pixel 0 (PIL edge semantics); the stacked gather would otherwise
        # blend pixels 0 and 1 — zero the weight instead. The high edge is
        # already right: the shifted stacks duplicate the last row/column.
        wx = jnp.where(x0 < 0, 0.0, sx - x0)
        wy = jnp.where(y0 < 0, 0.0, sy - y0)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        out = _gather_bilinear(img, x0i, y0i, wx, wy)

    out = jnp.where(oob[..., None], jnp.asarray(fill, out.dtype), out)
    if squeeze:
        out = out[..., 0]
    return out


def warp_bilinear_pil_exact(img: jax.Array, coeffs) -> jax.Array:
    """PIL Image.transform(PERSPECTIVE, BILINEAR) replay with STATIC
    host coeffs: the homography/floor/oob math runs on the host in
    float64 (Pillow's generic-transform precision — the device's float32
    evaluation flips floor() on ~1% of pixels), the gather + blend runs
    on device, and the store truncates like Pillow. Residual deviation:
    float32 blend-truncation ties only (golden-test bounded)."""
    import numpy as np

    from .augment_pil_exact import perspective_source_grid

    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ = img.shape
    sx, sy, oob = perspective_source_grid(h, w, coeffs)
    x0 = np.floor(sx)
    y0 = np.floor(sy)
    # low-edge clamp: x0 == -1 -> both taps are pixel 0 (see warp())
    wx = np.where(x0 < 0, 0.0, sx - x0).astype(np.float32)
    wy = np.where(y0 < 0, 0.0, sy - y0).astype(np.float32)
    x0i = np.clip(x0.astype(np.int32), 0, w - 1)
    y0i = np.clip(y0.astype(np.int32), 0, h - 1)

    out = _gather_bilinear(img, jnp.asarray(x0i), jnp.asarray(y0i),
                           jnp.asarray(wx), jnp.asarray(wy))
    out = jnp.trunc(_clip(out))
    out = jnp.where(jnp.asarray(oob)[..., None], jnp.float32(0.0), out)
    if squeeze:
        out = out[..., 0]
    return out


def warp_nearest_pil_exact(label: jax.Array, coeffs,
                           fill: float = 0.0) -> jax.Array:
    """NEAREST warp of an HW label map on the SAME float64 host grid as
    warp_bilinear_pil_exact — when the pil-exact image path is used with
    label correction, the label must sample from the identical source
    grid (the float32 device grid flips floor() vs float64 on ~1% of
    pixels, shifting labels one pixel off the image they annotate).
    Nearest index = floor(s + 0.5) (round half up), PIL's nearest
    convention; OOB uses the shared half-open mask."""
    import numpy as np

    from .augment_pil_exact import perspective_source_grid

    h, w = label.shape
    sx, sy, oob = perspective_source_grid(h, w, coeffs)
    xi = np.clip(np.floor(sx + 0.5).astype(np.int32), 0, w - 1)
    yi = np.clip(np.floor(sy + 0.5).astype(np.int32), 0, h - 1)
    out = jnp.take(label.reshape(h * w), jnp.asarray(yi * w + xi).reshape(-1),
                   axis=0).reshape(h, w)
    return jnp.where(jnp.asarray(oob), jnp.asarray(fill, out.dtype), out)


def rotation_coeffs(angle_deg: jax.Array, h: int, w: int) -> jax.Array:
    """Affine (as homography) coeffs for PIL-style rotate(angle, expand=False):
    counterclockwise rotation about the image center (w/2, h/2)."""
    # In y-down image coordinates the inverse map of a PIL CCW rotation is a
    # rotation by +angle (verified exact against PIL.Image.rotate NEAREST).
    theta = angle_deg * jnp.pi / 180.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = w * 0.5, h * 0.5
    # src = R @ (dst - center) + center
    a = cos
    b = -sin
    c = cx - cx * cos + cy * sin
    d = sin
    e = cos
    f = cy - cx * sin - cy * cos
    return jnp.stack([a, b, c, d, e, f, jnp.zeros(()), jnp.zeros(())])


def rotate_nearest_pil_exact(img: jax.Array, angle: float,
                             fill: float = 0.0) -> jax.Array:
    """PIL Image.rotate(angle, NEAREST, expand=False) BIT-exactly on
    device: Pillow's Geometry.c NEAREST affine fast path is 16.16
    fixed-point INTEGER accumulation (augment_pil_exact.
    rotate_fixed_point_starts), so with a static Python angle the whole
    sampling is int32 arithmetic + one flat gather — no float ties.
    angle must be a static (host) float."""
    from .augment_pil_exact import rotate_fixed_point_starts

    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, ch = img.shape
    xin0, yin0, dxx, dyy, dxr, dyr = rotate_fixed_point_starts(
        float(angle), w, h)
    # The 16.16 accumulators run in int32 on device (TPU jit has no int64
    # by default; the host twin uses int64). The accumulation is linear in
    # (x, y), so its extremes sit at the four corners — shapes and angle
    # are static, check them here and fail LOUDLY instead of silently
    # wrapping (reachable only above ~32k-pixel dimensions).
    for base, dc, dr in ((xin0, dxx, dxr), (yin0, dyy, dyr)):
        for x in (0, w - 1):
            for y in (0, h - 1):
                if not -2**31 <= base + y * dr + x * dc < 2**31:
                    raise ValueError(
                        f"rotate_nearest_pil_exact: {w}x{h} at angle "
                        f"{angle} overflows the int32 16.16 fixed-point "
                        f"accumulator; use augment_pil_exact."
                        f"rotate_nearest (int64 host path)")
    xs = jnp.arange(w, dtype=jnp.int32)
    ys = jnp.arange(h, dtype=jnp.int32)
    xin = (xin0 + ys[:, None] * dxr + xs[None, :] * dxx) >> 16
    yin = (yin0 + ys[:, None] * dyr + xs[None, :] * dyy) >> 16
    oob = (xin < 0) | (xin >= w) | (yin < 0) | (yin >= h)
    xi = jnp.clip(xin, 0, w - 1)
    yi = jnp.clip(yin, 0, h - 1)
    out = jnp.take(img.reshape(h * w, ch), (yi * w + xi).reshape(-1),
                   axis=0).reshape(h, w, ch)
    out = jnp.where(oob[..., None], jnp.asarray(fill, out.dtype), out)
    if squeeze:
        out = out[..., 0]
    return out


def _shift_rows_nearest(img: jax.Array, shifts: jax.Array, pad: int,
                        fill: float) -> jax.Array:
    """``out[y, x] = img[y, x - shifts[y]]`` (fill outside): a per-row-
    CONSTANT horizontal shift, GATHER-FREE. t = pad - shift is binary-
    decomposed into static left-shifts (pure slicing — fuses) gated per
    row by elementwise selects: ~11 VPU passes instead of any gather.
    Measured on v5e at 512x1540x3 bf16: 374 us/img vs 1321 for a
    vmapped-dynamic_slice row gather and ~8580 for the elementwise
    gather (tools/probe_3shear.py, probe_warp.py). Same-direction
    partial shifts compose exactly, so this equals the single shift
    bit-for-bit. ``pad`` must bound |shifts| (clipped; a clipped shift
    only produces more fill, never wrong pixels — the true content
    would land outside the window anyway). Works on any dtype
    (uint8 rotation rides this for 1/4 the float32 traffic)."""
    h, w, ch = img.shape
    cur = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)),
                  constant_values=fill)
    t = pad - jnp.clip(shifts, -pad, pad)   # left-shift amount in [0,2p]
    fillv = jnp.asarray(fill, cur.dtype)
    for k in range(int(2 * pad).bit_length()):
        step = 1 << k
        if step >= cur.shape[1]:
            shifted = jnp.full_like(cur, fillv)
        else:
            shifted = jnp.concatenate(
                [cur[:, step:],
                 jnp.full((h, step, ch), fillv, cur.dtype)], axis=1)
        bit = ((t >> k) & 1).astype(bool)
        cur = jnp.where(bit[:, None, None], shifted, cur)
    return cur[:, :w]


def _shift_cols_nearest(img: jax.Array, shifts: jax.Array, pad: int,
                        fill: float) -> jax.Array:
    """``out[y, x] = img[y - shifts[x], x]``: per-column-constant
    vertical shift, gather-free binary decomposition (see
    _shift_rows_nearest; 701 us/img measured vs 2562 for the column
    gather)."""
    h, w, ch = img.shape
    cur = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)),
                  constant_values=fill)
    t = pad - jnp.clip(shifts, -pad, pad)
    fillv = jnp.asarray(fill, cur.dtype)
    for k in range(int(2 * pad).bit_length()):
        step = 1 << k
        if step >= cur.shape[0]:
            shifted = jnp.full_like(cur, fillv)
        else:
            shifted = jnp.concatenate(
                [cur[step:],
                 jnp.full((step, w, ch), fillv, cur.dtype)], axis=0)
        bit = ((t >> k) & 1).astype(bool)
        cur = jnp.where(bit[None, :, None], shifted, cur)
    return cur[:h]


def rotate_nearest_3shear(img: jax.Array, angle_deg,
                          fill: float = 0.0) -> jax.Array:
    """TRAINING-ONLY fast nearest rotation: Paeth's 3-shear
    decomposition R(θ) = Sx(α)·Sy(β)·Sx(α), α = tan(θ/2)·(sign fixed
    for PIL's CCW display convention), β = -sin(θ).

    Every pass is a per-row(column)-constant integer shift, implemented
    GATHER-FREE as binary-decomposed static shifts + per-row selects
    (the TPU charges ~2.5 us per dynamically-gathered slice AND ~16 ns
    per gathered element — both paths lose; tools/probe_3shear.py:
    direct elementwise gather 8486 us/img, vmapped-slice 3-shear 5577,
    this form 2063 bf16 isolated; the uint8 production path measures
    1074 us/img END-TO-END incl. color ops = 7.9x, bench_aug
    B-GS-R:fast, bs=128 512x1024). Each shear
    is a BIJECTION on the integer grid, so the composition has no
    holes; the three roundings displace each source index by at most
    ±1 px in each axis vs PIL's direct inverse map
    (tests/test_data.py::test_rotate_3shear_envelope pins it). NOT for
    the pil-exact replay/oracle paths — use rotate_nearest_pil_exact
    there. dtype-generic: uint8 in, uint8 out (quarter the float32
    traffic — _aug_b_gs_r rotates BEFORE the color ops for this).

    Why rotation only (no H-RP analogue): the binary-shift trick is
    valid ONLY when the shift field is constant along the shifted axis
    (partial shifts must compose; masks are anchored to output coords).
    Shears qualify; a homography's Catmull-Smith passes do not, and no
    composition of generalized shears x+=f(y) / y+=g(x) can be
    projective (its level sets are a pencil of lines through a point,
    not a parallel family) — investigated and ruled out in round 5.

    Valid for |angle| <= 90 (the reference's RandomRotation(degrees=90)
    envelope; beyond it tan(θ/2) grows past the padding bound and the
    clip yields fill, never wrong pixels). angle may be traced (the
    per-sample jax.random draw) or static.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ch = img.shape
    rad = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    alpha = jnp.tan(rad / 2.0)
    beta = -jnp.sin(rad)
    # pixel-index centers, matching PIL's (w/2, h/2) continuous center
    # evaluated at +0.5 pixel centers
    cy = (h - 1) / 2.0
    # widen the canvas so pass-1/3 content (|dx| <= h/2 at |θ|<=90)
    # survives to the final crop; pass 2 cannot bring back rows shifted
    # beyond ±h (pass 3 is horizontal), so its pad is h + 2.
    ex = h // 2 + 2
    canvas = jnp.pad(img, ((0, 0), (ex, ex), (0, 0)),
                     constant_values=fill)
    cw = w + 2 * ex
    cx = (cw - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(cw, dtype=jnp.float32)
    s13 = jnp.round(alpha * (ys - cy)).astype(jnp.int32)
    s2 = jnp.round(beta * (xs - cx)).astype(jnp.int32)
    out = _shift_rows_nearest(canvas, s13, h // 2 + 2, fill)
    out = _shift_cols_nearest(out, s2, h + 2, fill)
    out = _shift_rows_nearest(out, s13, h // 2 + 2, fill)
    out = out[:, ex:ex + w]
    if squeeze:
        out = out[..., 0]
    return out


def sample_perspective_endpoints(key: jax.Array, h: int, w: int,
                                 distortion: float = 0.5):
    """torchvision RandomPerspective.get_params integer-corner sampling."""
    half_h, half_w = h // 2, w // 2
    dh = int(distortion * half_h)
    dw = int(distortion * half_w)
    ks = jax.random.split(key, 8)
    ri = lambda k, lo, hi: jax.random.randint(k, (), lo, hi).astype(jnp.float32)
    topleft = (ri(ks[0], 0, dw + 1), ri(ks[1], 0, dh + 1))
    topright = (ri(ks[2], w - dw - 1, w), ri(ks[3], 0, dh + 1))
    botright = (ri(ks[4], w - dw - 1, w), ri(ks[5], h - dh - 1, h))
    botleft = (ri(ks[6], 0, dw + 1), ri(ks[7], h - dh - 1, h))
    start = jnp.array([[0.0, 0.0], [w - 1.0, 0.0],
                       [w - 1.0, h - 1.0], [0.0, h - 1.0]], jnp.float32)
    end = jnp.array([topleft, topright, botright, botleft], jnp.float32)
    return start, end


# ----------------------------------------------------- composed families
def _aug_cs_hf(img, label, key, augment_labels, fast_geometry=False):
    kc, ks = jax.random.split(key)
    img = adjust_contrast(img, jax.random.uniform(kc, (), minval=2.0,
                                                  maxval=5.0))
    img = adjust_saturation(img, jax.random.uniform(ks, (), minval=1.0,
                                                    maxval=3.0))
    img = hflip(img)
    if augment_labels:
        label = label[:, ::-1]
    return img, label


def _aug_h_rp(img, label, key, augment_labels, fast_geometry=False):
    # (no shear decomposition exists for a projective warp — the fast
    # flag is a no-op here; use --host_augment for H-RP on TPU)
    kh, kp = jax.random.split(key)
    img = adjust_hue(img, jax.random.uniform(kh, (), minval=-0.2, maxval=0.2))
    h, w = img.shape[0], img.shape[1]
    start, end = sample_perspective_endpoints(kp, h, w, 0.5)
    coeffs = perspective_coeffs(start, end)
    img = warp(img, coeffs, mode="bilinear", fill=0.0)
    if augment_labels:
        label = warp(label.astype(jnp.float32), coeffs, mode="nearest",
                     fill=IGNORE_FILL).astype(label.dtype)
    return img, label


def _aug_b_gs_r(img, label, key, augment_labels, fast_geometry=False):
    kb, kr = jax.random.split(key)
    angle = jax.random.uniform(kr, (), minval=-90.0, maxval=90.0)
    if fast_geometry:
        # Paeth 3-shear (gather-free, ±1 px envelope — training only).
        # Rotation runs FIRST, on uint8: nearest rotation is a pure
        # pixel permutation + fill, per-pixel color ops commute with it
        # and map fill 0 -> 0 (brightness: blend vs black; grayscale:
        # luma of 0), so this order is BIT-identical to the reference
        # color->rotate order at 1/4 the rotation traffic. The family
        # entry values are uint8-origin (prepare_batch casts u8->f32
        # right before augmenting), so the cast is lossless.
        img = rotate_nearest_3shear(
            img.astype(jnp.uint8), angle, fill=0).astype(jnp.float32)
        if augment_labels:
            label = rotate_nearest_3shear(label, angle, fill=IGNORE_FILL)
        img = adjust_brightness(img, jax.random.uniform(kb, (), minval=1.0,
                                                        maxval=2.0))
        img = to_grayscale3(img)
        return img, label
    img = adjust_brightness(img, jax.random.uniform(kb, (), minval=1.0,
                                                    maxval=2.0))
    img = to_grayscale3(img)
    h, w = img.shape[0], img.shape[1]
    coeffs = rotation_coeffs(angle, h, w)
    img = warp(img, coeffs, mode="nearest", fill=0.0)
    if augment_labels:
        label = warp(label.astype(jnp.float32), coeffs, mode="nearest",
                     fill=IGNORE_FILL).astype(label.dtype)
    return img, label


_FAMILIES = {"CS-HF": _aug_cs_hf, "H-RP": _aug_h_rp, "B-GS-R": _aug_b_gs_r}


def apply_family_with_params(img: jax.Array, label: jax.Array,
                             aug_type: str, params: dict,
                             augment_labels: bool = False,
                             pil_exact: bool = True):
    """One aug menu with EXPLICIT parameters instead of a PRNG key — the
    on-device twin of augment_pil_exact.apply_family, used to replay a
    reference-side (torch-seeded) augmentation realization through OUR
    kernels (tools/reference_eval.extract_aug_params produces `params`).

    pil_exact=True routes color ops through the bit-exact PIL semantics
    (trunc blends, integer luma, exact int-mean contrast) and rotation
    through the integer fixed-point PIL path — CS-HF and B-GS-R outputs
    are then BIT-identical to torchvision-on-PIL; hue and the bilinear
    perspective warp keep float32 device math with measured sub-lsb tie
    envelopes (tests/test_augment_parity.py pins both claims).
    """
    if not params.get("applied", True):
        return img, label
    if aug_type == "CS-HF":
        img = adjust_contrast(img, params["contrast"], pil_exact=pil_exact)
        img = adjust_saturation(img, params["saturation"],
                                pil_exact=pil_exact)
        img = hflip(img)
        if augment_labels:
            label = label[:, ::-1]
        return img, label
    if aug_type == "H-RP":
        if pil_exact:
            from .augment_pil_exact import hue_shift_u8
            img = adjust_hue_pil(img, hue_shift_u8(params["hue"]))
            img = warp_bilinear_pil_exact(img, params["coeffs"])
            if augment_labels:
                # SAME float64 host grid as the image — a float32 device
                # grid would shift labels one pixel off the image where
                # f32 vs f64 floor() flips (~1% of pixels)
                label = warp_nearest_pil_exact(
                    label.astype(jnp.float32), params["coeffs"],
                    fill=IGNORE_FILL).astype(label.dtype)
        else:
            img = adjust_hue(img, jnp.float32(params["hue"]))
            img = warp(img, jnp.asarray(params["coeffs"], jnp.float32),
                       mode="bilinear", fill=0.0)
            if augment_labels:
                label = warp(label.astype(jnp.float32),
                             jnp.asarray(params["coeffs"], jnp.float32),
                             mode="nearest",
                             fill=IGNORE_FILL).astype(label.dtype)
        return img, label
    if aug_type == "B-GS-R":
        img = adjust_brightness(img, params["brightness"],
                                pil_exact=pil_exact)
        img = to_grayscale3(img, pil_exact=pil_exact)
        angle = params["angle"]
        if pil_exact:
            img = rotate_nearest_pil_exact(img, angle, fill=0.0)
            if augment_labels:
                label = rotate_nearest_pil_exact(
                    label.astype(jnp.float32), angle,
                    fill=IGNORE_FILL).astype(label.dtype)
        else:
            h, w = img.shape[0], img.shape[1]
            coeffs = rotation_coeffs(jnp.float32(angle), h, w)
            img = warp(img, coeffs, mode="nearest", fill=0.0)
            if augment_labels:
                label = warp(label.astype(jnp.float32), coeffs,
                             mode="nearest",
                             fill=IGNORE_FILL).astype(label.dtype)
        return img, label
    raise ValueError(f"unknown aug_type {aug_type!r}")


def augment_sample(img: jax.Array, label: jax.Array, key: jax.Array,
                   aug_type: Optional[str],
                   augment_labels: bool = False,
                   apply_prob: float = 0.5,
                   fast_geometry: bool = False):
    """RandomApply(p=0.5)-wrapped family on one sample.

    img: HWC float32 in [0, 255]; label: HW integer.
    fast_geometry: B-GS-R rotates via the 3-shear decomposition
    (training-only, ±1 px source-index envelope) instead of the direct
    gather — see rotate_nearest_3shear.
    """
    if aug_type is None:
        return img, label
    fam = _FAMILIES[aug_type]
    k_apply, k_aug = jax.random.split(key)
    do = jax.random.uniform(k_apply, ()) < apply_prob

    def yes(args):
        i, l = args
        return fam(i, l, k_aug, augment_labels, fast_geometry)

    def no(args):
        return args

    return jax.lax.cond(do, yes, no, (img, label))


def augment_batch(imgs: jax.Array, labels: jax.Array, key: jax.Array,
                  aug_type: Optional[str], augment_labels: bool = False,
                  apply_prob: float = 0.5, fast_geometry: bool = False):
    """Per-sample keyed batch augmentation (vmapped)."""
    if aug_type is None:
        return imgs, labels
    keys = jax.random.split(key, imgs.shape[0])
    fn = functools.partial(augment_sample, aug_type=aug_type,
                           augment_labels=augment_labels,
                           apply_prob=apply_prob,
                           fast_geometry=fast_geometry)
    return jax.vmap(fn)(imgs, labels, keys)
