"""Fixed-shape patch tiles — the TPU-native replacement for ImagePatch.

The reference stores ragged per-source pixel boxes with boolean bitmaps
(model/imaged_sources.jl:60-117). For XLA we use static (B, P, P) tiles per
source: all five bands of a source's surroundings, masked. Ragged reality is
handled by masking; bucketing by tile size happens in parallel/.

A SkyPatch is a NamedTuple of arrays (a pytree), so it vmaps/shards freely.
Leading axes: standalone (B, ...) for one source, or (S, B, ...) when stacked.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class SkyPatch(NamedTuple):
    pixels: jnp.ndarray        # (B, P, P) raw electron counts; NaN = masked
    mask: jnp.ndarray          # (B, P, P) bool: active pixels for this source
    sky: jnp.ndarray           # (B, P, P) sky background in nMgy
    iota: jnp.ndarray          # (B, P, P) nelec per nMgy calibration
    offset: jnp.ndarray        # (B, 2) int32, 0-based tile corner in image
    wcs_jacobian: jnp.ndarray  # (B, 2, 2) d(pixel)/d(world) at patch center
    world_center: jnp.ndarray  # (B, 2)
    pixel_center: jnp.ndarray  # (B, 2) 1-based pixel coords of world_center
    psf: jnp.ndarray           # (B, K, 6) packed PSF mixture per band

    @property
    def n_bands(self):
        return self.pixels.shape[-3]

    @property
    def tile_size(self):
        return self.pixels.shape[-1]


def pixel_coord_grids(offset, P, dtype=jnp.float64):
    """1-based pixel-coordinate grids (x1, x2) each (rows, cols) for a tile
    whose 0-based corner in the image is `offset` (2,). P: int (square tile)
    or (rows, cols) — rectangular tiles arise when pixel rows are sharded
    across a mesh axis (parallel/mesh.py)."""
    rows, cols = (P, P) if isinstance(P, int) else P
    r1 = jnp.arange(1, rows + 1, dtype=dtype)
    r2 = jnp.arange(1, cols + 1, dtype=dtype)
    x1 = offset[0].astype(dtype)[None, None] + r1[:, None] + jnp.zeros((1, cols), dtype)
    x2 = offset[1].astype(dtype)[None, None] + r2[None, :] + jnp.zeros((rows, 1), dtype)
    return x1, x2


def make_patch_for_source(images, world_pos, radius, tile_size, psf=None,
                          active_box=None):
    """Build a SkyPatch (host-side, numpy) for one source.

    images: list of B Image objects (models/image.py).
    world_pos: (2,) world coordinates of the source.
    radius: active radius in pixels (active mask = box of this radius).
    tile_size: static P.
    psf: optional (B, K, 6) per-band LOCAL PSF for this source (the
        spatially-varying psfmap evaluated at the patch center,
        model/imaged_sources.jl:97-107); default = each image's global PSF.
    active_box: optional (B, 4) [x_lo, x_hi, y_lo, y_hi] 1-based inclusive
        active-region bounds per band (e.g. dilated detection boxes,
        detection.jl:152-167); overrides the ±radius box.
    """
    world_pos = np.asarray(world_pos, dtype=np.float64)
    B, P = len(images), tile_size
    pix = np.full((B, P, P), np.nan, dtype=np.float64)
    mask = np.zeros((B, P, P), dtype=bool)
    sky = np.zeros((B, P, P), dtype=np.float64)
    iota = np.ones((B, P, P), dtype=np.float64)
    offset = np.zeros((B, 2), dtype=np.int32)
    jac = np.zeros((B, 2, 2), dtype=np.float64)
    wc = np.zeros((B, 2), dtype=np.float64)
    pc = np.zeros((B, 2), dtype=np.float64)
    psf = (np.asarray(psf, dtype=np.float64) if psf is not None
           else np.stack([np.asarray(img.psf, dtype=np.float64)
                          for img in images]))

    for b, img in enumerate(images):
        H, W = img.pixels.shape
        ctr = np.asarray(img.world_to_pix(world_pos), dtype=np.float64)
        off = np.round(ctr - 1.0 - (P - 1) / 2.0).astype(np.int64)  # 0-based corner
        offset[b] = off
        pc[b] = ctr
        jac[b] = img.wcs_jacobian(ctr)
        wc[b] = world_pos

        # overlap of tile with image
        i0, i1 = max(0, off[0]), min(H, off[0] + P)
        j0, j1 = max(0, off[1]), min(W, off[1] + P)
        if i0 >= i1 or j0 >= j1:
            continue
        ti0, tj0 = i0 - off[0], j0 - off[1]
        sl_img = (slice(i0, i1), slice(j0, j1))
        sl_t = (slice(ti0, ti0 + (i1 - i0)), slice(tj0, tj0 + (j1 - j0)))
        pix[b][sl_t] = img.pixels[sl_img]

        s = img.sky
        sky[b][sl_t] = s[sl_img] if np.ndim(s) == 2 else s
        io_ = img.nelec_per_nmgy
        if np.ndim(io_) == 1:
            iota[b][sl_t] = io_[i0:i1, None]
        else:
            iota[b][sl_t] = io_

        # active = in-tile, in-image, within the active box, not NaN
        ii = np.arange(P)[:, None] + off[0] + 1.0  # 1-based coords
        jj = np.arange(P)[None, :] + off[1] + 1.0
        if active_box is not None:
            xlo, xhi, ylo, yhi = np.asarray(active_box, np.float64)[b]
        else:
            xlo, xhi = ctr[0] - radius, ctr[0] + radius
            ylo, yhi = ctr[1] - radius, ctr[1] + radius
        inbox = ((ii >= xlo) & (ii <= xhi) & (jj >= ylo) & (jj <= yhi))
        valid = np.zeros((P, P), dtype=bool)
        valid[sl_t] = ~np.isnan(pix[b][sl_t])
        mask[b] = inbox & valid

    # Leaves stay HOST numpy: a per-source device upload is 9 transfers per
    # patch (over a tunneled TPU each is a round-trip — measured ~10 s of
    # host time per 128-source field); stack_patches uploads each field's
    # group once instead. numpy leaves enter jit/vmap transparently.
    return SkyPatch(pixels=pix, mask=mask, sky=sky, iota=iota,
                    offset=offset, wcs_jacobian=jac, world_center=wc,
                    pixel_center=pc, psf=psf)


def make_patches_batched(images, positions, radii, tile_size, psfs=None,
                         active_boxes=None):
    """Build SkyPatches for S sources with ONE vectorized gather per band.

    Replaces S calls to make_patch_for_source (round 1's ~30 ms/source
    Python staging loop, the field-scale bottleneck) with numpy fancy
    indexing over the whole catalog: same outputs, O(S) work in C.

    images: list of B Image objects; positions: (S, 2) world coords;
    radii: (S,) active radii; tile_size: static P; psfs: optional
    (S, B, K, 6) per-source local PSFs (see psf_fit.fit_patch_psfs).
    active_boxes: optional (S, B, 4) [x_lo, x_hi, y_lo, y_hi] 1-based
    inclusive pixel bounds of the active region per source per image —
    e.g. the dilated detection bounding boxes (detection.jl:152-167);
    default is the ±radius box around the source center.
    Returns a list of S SkyPatch (numpy leaves, views into shared buffers).
    """
    positions = np.asarray(positions, dtype=np.float64)
    radii = np.asarray(radii, dtype=np.float64)
    S, B, P = len(positions), len(images), tile_size
    pix = np.full((S, B, P, P), np.nan, dtype=np.float64)
    mask = np.zeros((S, B, P, P), dtype=bool)
    sky = np.zeros((S, B, P, P), dtype=np.float64)
    iota = np.ones((S, B, P, P), dtype=np.float64)
    offset = np.zeros((S, B, 2), dtype=np.int32)
    jac = np.zeros((S, B, 2, 2), dtype=np.float64)
    wc = np.broadcast_to(positions[:, None, :], (S, B, 2)).copy()
    pc = np.zeros((S, B, 2), dtype=np.float64)
    if psfs is not None:
        psf = np.asarray(psfs, dtype=np.float64)
    else:
        psf = np.broadcast_to(
            np.stack([np.asarray(img.psf, dtype=np.float64)
                      for img in images]), (S, B) + np.shape(images[0].psf)
        ).copy()

    ar = np.arange(P)
    for b, img in enumerate(images):
        H, W = img.pixels.shape
        ctr = np.asarray(img.world_to_pix(positions), dtype=np.float64)
        off = np.round(ctr - 1.0 - (P - 1) / 2.0).astype(np.int64)  # (S, 2)
        offset[:, b] = off
        pc[:, b] = ctr
        jac[:, b] = img.wcs_jacobian(ctr)

        ii = off[:, 0:1] + ar[None, :]          # (S, P) 0-based rows
        jj = off[:, 1:2] + ar[None, :]          # (S, P) 0-based cols
        vi = (ii >= 0) & (ii < H)
        vj = (jj >= 0) & (jj < W)
        iic = np.clip(ii, 0, H - 1)
        jjc = np.clip(jj, 0, W - 1)
        valid = vi[:, :, None] & vj[:, None, :]  # (S, P, P)
        gathered = img.pixels[iic[:, :, None], jjc[:, None, :]]
        pix[:, b] = np.where(valid, gathered, np.nan)

        s = img.sky
        if np.ndim(s) == 2:
            sky[:, b] = np.where(valid, s[iic[:, :, None], jjc[:, None, :]],
                                 0.0)
        else:
            sky[:, b] = np.where(valid, s, 0.0)
        io_ = img.nelec_per_nmgy
        if np.ndim(io_) == 1:
            iota[:, b] = np.where(valid, np.asarray(io_)[iic][:, :, None],
                                  1.0)
        else:
            iota[:, b] = np.where(valid, io_, 1.0)

        # active = in-tile, in-image, within the active box, not NaN
        i1 = ii + 1.0   # 1-based coords
        j1 = jj + 1.0
        if active_boxes is not None:
            bx = np.asarray(active_boxes, dtype=np.float64)[:, b]  # (S, 4)
        else:
            bx = np.stack([ctr[:, 0] - radii, ctr[:, 0] + radii,
                           ctr[:, 1] - radii, ctr[:, 1] + radii], axis=1)
        inbox = (((i1 >= bx[:, 0:1]) & (i1 <= bx[:, 1:2]))[:, :, None]
                 & ((j1 >= bx[:, 2:3]) & (j1 <= bx[:, 3:4]))[:, None, :])
        mask[:, b] = inbox & valid & ~np.isnan(pix[:, b])

    return [SkyPatch(pixels=pix[s], mask=mask[s], sky=sky[s], iota=iota[s],
                     offset=offset[s], wcs_jacobian=jac[s],
                     world_center=wc[s], pixel_center=pc[s], psf=psf[s])
            for s in range(S)]


def stack_patches(patches, dtype=None):
    """Stack per-source SkyPatches into one with leading S axis, placed on
    device — ONE transfer per field (9 total), however many sources.

    Float fields are cast to the runtime float dtype on the HOST before the
    upload: feeding f64 numpy through jnp.asarray with x64 off ships ~2.4x
    the bytes/time over a tunneled TPU (measured 4.5 s vs 1.9 s for a
    (512,5,64,64) tile stack) — staging uploads are the dominant non-device
    cost of the fused joint schedule at field scale (benchmark/
    field_results.md width-scaling study). Under x64 (the f64 test suite)
    the cast is a no-op. Pass `dtype` to pin the upload precision
    regardless of the ambient x64 setting."""
    target = dtype if dtype is not None else jnp.result_type(float)
    out = []
    for f in SkyPatch._fields:
        arr = np.stack([getattr(p, f) for p in patches])
        if arr.dtype.kind == "f" and arr.dtype != target:
            arr = arr.astype(target)
        out.append(jnp.asarray(arr))
    return SkyPatch(*out)
