"""Device-mesh scheduling of batched source fits (shard_map over TPU chips).

TPU-native replacement for the reference's thread-level scheduler
(ParallelRun.jl:203-369). Two mesh axes:

  * ``src`` — source-level data parallelism: each chip fits its shard of the
    source batch independently (the analog of `Threads.@threads` over thread
    partitions, ParallelRun.jl:285-296).
  * ``pix`` — pixel sharding: a source's patch tiles are split across chips
    by rows and the per-pixel ELBO terms are psum'ed over ICI. Exact, because
    the ELBO is a sum over pixels (SURVEY.md §5 "long-context" analog). Use
    when a single patch exceeds one core's VMEM.

Inputs/outputs stay as ordinary arrays; shard_map handles the collective
placement. Cyclades batches (parallel/partition.py) map to *sequential*
calls of fit_sources_sharded — the batch barrier.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.patches import SkyPatch
from ..ops.newton import NewtonConfig
from ..vi.optimize import FitResult, maximize

SRC_AXIS = "src"
PIX_AXIS = "pix"


def make_mesh(n_src=None, n_pix=1, devices=None):
    """A (src, pix) 2-D device mesh. Default: all devices on the src axis."""
    devices = devices if devices is not None else jax.devices()
    if n_src is None:
        n_src = len(devices) // n_pix
    assert n_src * n_pix <= len(devices), (n_src, n_pix, len(devices))
    dev = np.asarray(devices[: n_src * n_pix]).reshape(n_src, n_pix)
    return Mesh(dev, (SRC_AXIS, PIX_AXIS))


def _pad_sources(vp0s, patches, multiple):
    S = vp0s.shape[0]
    S_pad = math.ceil(S / multiple) * multiple
    if S_pad == S:
        return vp0s, patches, S
    reps = S_pad - S

    def pad(x):
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (reps,) + x.shape[1:])], axis=0)

    return pad(vp0s), SkyPatch(*[pad(f) for f in patches]), S


def _patch_specs():
    """PartitionSpecs for each SkyPatch field, (S, B, P, P) tiles sharded on
    sources and pixel rows; per-source metadata sharded on sources only."""
    tile = P(SRC_AXIS, None, PIX_AXIS, None)
    meta = P(SRC_AXIS)
    return SkyPatch(pixels=tile, mask=tile, sky=tile, iota=tile,
                    offset=meta, wcs_jacobian=meta, world_center=meta,
                    pixel_center=meta, psf=meta)


def _shift_row_offset(patch_local, pix_rank, rows_per_shard):
    """Local tiles hold rows [pix_rank*rows, (pix_rank+1)*rows) of the full
    tile; shift the tile-corner row offset so pixel coordinates stay exact."""
    shift = (pix_rank * rows_per_shard).astype(patch_local.offset.dtype)
    offset = patch_local.offset.at[..., 0].add(shift)
    return patch_local._replace(offset=offset)


def fit_sources_sharded(vp0s, patches, mesh, include_kl=True,
                        config: NewtonConfig = NewtonConfig()):
    """Batched Newton-TR fits sharded over a (src, pix) device mesh.

    vp0s: (S, 44); patches: SkyPatch with leading S axis and (B, P, P) tiles.
    P must be divisible by the pix-axis size. S is padded to a multiple of
    the src-axis size; padded lanes are dropped from the result.
    Returns FitResult with leading S axis (fully replicated host arrays).
    """
    n_src = mesh.shape[SRC_AXIS]
    n_pix = mesh.shape[PIX_AXIS]
    Ptile = patches.pixels.shape[-2]
    if Ptile % n_pix != 0:
        raise ValueError(f"tile size {Ptile} not divisible by pix axis {n_pix}")
    rows = Ptile // n_pix

    vp0s, patches, S = _pad_sources(jnp.asarray(vp0s), patches, n_src)

    pixel_axis = PIX_AXIS if n_pix > 1 else None
    fit_one = partial(maximize, include_kl=include_kl, config=config,
                      pixel_axis=pixel_axis)

    def shard_fn(vp_block, patch_block):
        pix_rank = jax.lax.axis_index(PIX_AXIS)
        patch_block = _shift_row_offset(patch_block, pix_rank, rows)
        return jax.vmap(fit_one)(vp_block, patch_block)

    out_spec = FitResult(vp=P(SRC_AXIS), elbo=P(SRC_AXIS), iters=P(SRC_AXIS),
                         f_calls=P(SRC_AXIS), converged=P(SRC_AXIS),
                         delta=P(SRC_AXIS), free=P(SRC_AXIS))
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(SRC_AXIS), _patch_specs()),
                       out_specs=out_spec, check_vma=False)
    res = jax.jit(fn)(vp0s, patches)
    return FitResult(*[f[:S] for f in res])
