"""Data-parallel OCR inference over a device mesh.

The batched recognizer (models.recognizer._recognize_device) is a pure
function of a (B, Hp, Wp/32) bit-packed strip batch; scaling out is one
``jit`` with shardings: the batch axis shards over the mesh's ``data``
axis, parameters replicate, and XLA inserts any collectives (there are
none in the forward — each device recognizes its shard of lines
independently, the multi-chip analog of ``ocropus-rpred -Q N``,
SURVEY.md §2 parallelism checklist).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.lru_cache(maxsize=None)
def _sharded_fn(mesh: Mesh, t_max: int, target_height: int, pad: int,
                max_regions: int, decode: str = "region"):
    from ..models.recognizer import _recognize_device

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def fn(params, packed_meta):
        return _recognize_device(
            params, packed_meta, t_max=t_max,
            target_height=target_height, pad=pad, max_regions=max_regions,
            decode=decode,
        )

    return jax.jit(
        fn,
        in_shardings=(repl, data),
        out_shardings=data,
    )


# per-device strip counts of the most recent sharded dispatch — the
# work-partition evidence the dry run prints and tests assert on
# ({device str: rows}; overwritten per call)
LAST_WORK_SHARES: dict = {}


def _assert_partitioned(out, mesh: Mesh) -> dict:
    """Certify the batch axis is PARTITIONED over the mesh's data axis —
    one addressable shard per LOCAL device, equal row shares, not
    replicated. Guards against a silent GSPMD fallback to replication
    (which would be output-identical but do n× the work). Under
    multi-process meshes each process certifies its local slice; the
    multihost dry run all-gathers the shares for the global proof."""
    import jax

    n = mesh.shape["data"]
    pid = jax.process_index()
    n_local = sum(1 for d in mesh.devices.flat if d.process_index == pid)
    shards = out.addressable_shards
    assert len(shards) == n_local, (
        f"expected {n_local} local shards (one per local device), "
        f"got {len(shards)}")
    shares = {str(s.device): int(s.data.shape[0]) for s in shards}
    want = out.shape[0] // n
    assert all(v == want for v in shares.values()), (
        f"batch axis not evenly partitioned: {shares}")
    return shares


def recognize_sharded_meta(params, packed_meta: np.ndarray, mesh: Mesh,
                           t_max: int, target_height: int, pad: int,
                           max_regions: int, decode: str = "region"):
    """Run the fused recognizer with the batch sharded over ``mesh``.

    ``packed_meta`` is the recognizer's one-upload wire format
    ((B, Hp + 1, Wp/32) int32 — bits plus a trailing (h, w) metadata row,
    see models.recognizer._recognize_device). Batch rows padded for
    data-axis divisibility carry h = w = 0 and decode to zero regions.
    Every call certifies the batch actually PARTITIONED across the mesh
    (LAST_WORK_SHARES records the per-device strip counts)."""
    from .multihost import fetch, is_multiprocess, put_global

    if is_multiprocess():
        # single-device-committed param leaves can't be auto-resharded to
        # a cross-process replicated sharding; feed them as host numpy
        # (replicated numpy inputs are allowed, and the model is tiny)
        import jax

        params = jax.tree.map(np.asarray, params)
    n = mesh.shape["data"]
    B = packed_meta.shape[0]
    if B % n:
        pad_b = n - (B % n)
        packed_meta = np.pad(packed_meta, ((0, pad_b), (0, 0), (0, 0)))
    fn = _sharded_fn(mesh, t_max, target_height, pad, max_regions,
                     decode)
    out = fn(params, put_global(packed_meta, NamedSharding(mesh, P("data"))))
    LAST_WORK_SHARES.clear()
    LAST_WORK_SHARES.update(_assert_partitioned(out, mesh))
    return fetch(out)[:B]


def recognize_sharded(params, packed_bits: np.ndarray, hs: np.ndarray,
                      ws: np.ndarray, mesh: Mesh, t_max: int,
                      target_height: int, pad: int, max_regions: int,
                      decode: str = "region"):
    """Convenience wrapper over :func:`recognize_sharded_meta` for callers
    holding separate bits/hs/ws arrays (e.g. the driver dry run)."""
    B, _, Wq = packed_bits.shape
    meta = np.zeros((B, 1, Wq), packed_bits.dtype)
    meta[:, 0, 0] = hs
    meta[:, 0, 1] = ws
    return recognize_sharded_meta(
        params, np.concatenate([packed_bits, meta], axis=1), mesh,
        t_max=t_max, target_height=target_height, pad=pad,
        max_regions=max_regions, decode=decode,
    )
