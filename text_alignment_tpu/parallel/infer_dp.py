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

    def fn(params, packed_bits, hs, ws):
        return _recognize_device(
            params, packed_bits, hs, ws, t_max=t_max,
            target_height=target_height, pad=pad, max_regions=max_regions,
            decode=decode,
        )

    return jax.jit(
        fn,
        in_shardings=(repl, data, data, data),
        out_shardings=data,
    )


def recognize_sharded(params, packed_bits: np.ndarray, hs: np.ndarray,
                      ws: np.ndarray, mesh: Mesh, t_max: int,
                      target_height: int, pad: int, max_regions: int,
                      decode: str = "region"):
    """Run the fused recognizer with the batch sharded over ``mesh``.

    The batch dim must be divisible by the mesh's data-axis size (the
    recognizer's power-of-two batch padding guarantees this for meshes of
    power-of-two size).
    """
    n = mesh.shape["data"]
    B = packed_bits.shape[0]
    if B % n:
        pad_b = n - (B % n)
        packed_bits = np.pad(packed_bits, ((0, pad_b), (0, 0), (0, 0)))
        hs = np.pad(hs, (0, pad_b))
        ws = np.pad(ws, (0, pad_b))
    fn = _sharded_fn(mesh, t_max, target_height, pad, max_regions,
                     decode)
    return np.asarray(fn(params, packed_bits, hs, ws))[:B]
