"""Multi-host (DCN / multiprocess) support for the sharded paths.

The single-host mesh story (parallel.infer_dp / train_dp / batch) covers
ICI scale-out inside one process. This module closes SURVEY §5's DCN
sentence: the same sharded programs run across ``jax.distributed``
process boundaries — each process owns a slice of the device mesh, the
batch axis partitions across ALL processes, and XLA's collectives ride
whatever transport the platform provides (ICI intra-host, DCN across
hosts; Gloo on the CPU dry run).

Two mechanical differences from the single-process path, wrapped here so
production callers (infer_dp, nw_jax) stay transport-agnostic:

- jit refuses numpy inputs under a non-trivial multi-process sharding;
  identical-on-every-process host data must become a global jax.Array
  via ``make_array_from_callback`` (:func:`put_global`).
- ``np.asarray`` on a jit output that spans processes requires the value
  to be fully replicated first (:func:`fetch`).

The fan-out analog in the reference is Rodan/Celery scheduling jobs
across workers (textAlignment.py:51) — there the transport is a message
queue and results never reconverge; here every process holds the full
byte-identical result after ``fetch``.
"""

from __future__ import annotations

import numpy as np


def process_count() -> int:
    import jax

    return jax.process_count()


def is_multiprocess() -> bool:
    return process_count() > 1


def put_global(arr: np.ndarray, sharding):
    """Host numpy (identical on every process) -> global jax.Array with
    ``sharding``. Single-process: return the numpy array unchanged (jit
    transfers it; keeps the hot path free of extra machinery)."""
    import jax

    if not is_multiprocess():
        return arr
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def fetch(out) -> np.ndarray:
    """np.asarray for a jit output that may span processes: replicate
    (all-gather over the mesh) when not fully addressable, then read the
    local copy."""
    import jax

    if getattr(out, "is_fully_addressable", True):
        return np.asarray(out)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = out.sharding.mesh
    repl = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P()))(out)
    return np.asarray(repl)


def gather_shares(local_shares: dict) -> dict:
    """All-gather per-device work shares across processes — the global
    partition proof. Keys are device strings; every process returns the
    same merged dict."""
    if not is_multiprocess():
        return dict(local_shares)
    import json

    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    blob = json.dumps(local_shares, sort_keys=True).encode()
    pad = 4096
    assert len(blob) < pad
    row = np.zeros(pad, np.uint8)
    row[: len(blob)] = np.frombuffer(blob, np.uint8)
    allrows = np.asarray(multihost_utils.process_allgather(jnp.asarray(row)))
    merged: dict = {}
    for r in allrows:
        raw = bytes(r.tobytes()).rstrip(b"\x00")
        merged.update(json.loads(raw.decode()))
    return merged


def dryrun_body(n_processes: int) -> None:
    """Body of the multi-host dry run — executed inside EVERY
    ``jax.distributed``-initialized process. Runs the sharded train step,
    the sharded OCR batch, the sharded folio pipeline, and the sharded
    scoring grid with meshes spanning ALL processes, asserting (a) the
    work actually partitions across process boundaries and (b) results
    are byte-identical both to the unsharded run and across processes.
    (SURVEY §5:315-320 DCN story; fan-out analog textAlignment.py:51.)"""
    import json

    import jax

    pid = jax.process_index()
    assert jax.process_count() == n_processes
    devs = jax.devices()
    n_devices = len(devs)
    n_local = len(jax.local_devices())
    assert n_devices == n_processes * n_local, (n_devices, n_processes,
                                                n_local)

    def say(msg):
        if pid == 0:
            print(f"dryrun_multihost({n_processes}x{n_local}): {msg}",
                  flush=True)

    from . import data_model_mesh, make_mesh, sharded_train_demo_step
    from . import infer_dp

    # 1. sharded train step across process boundaries
    mesh2 = data_model_mesh(n_devices)
    loss = sharded_train_demo_step(mesh2)
    assert np.isfinite(loss)
    assert_same_across_processes("train loss", loss)
    say(f"train step ok over mesh={dict(mesh2.shape)} loss={loss:.4f} "
        f"(identical on all {n_processes} processes)")

    # 2. sharded OCR batch: global partition proof
    from ..models.codec import Codec
    from ..models.lstm_jax import init_bilstm
    from ..models.recognizer import _unpack_wire_rows
    from .infer_dp import recognize_sharded

    codec = Codec()
    params = init_bilstm(jax.random.PRNGKey(0), 48, 100, len(codec))
    mesh1 = make_mesh(n_devices)
    rng = np.random.default_rng(0)
    B, Hp, Wp = max(8, n_devices), 128, 256
    bits = rng.integers(0, 2**31, (B, Hp, Wp // 32)).astype(np.int32)
    hs = np.full(B, 60, np.int32)
    ws = np.full(B, 200, np.int32)
    wire = recognize_sharded(params, bits, hs, ws, mesh1, t_max=256,
                             target_height=48, pad=16, max_regions=64)
    packed = _unpack_wire_rows(wire)
    shares = gather_shares(infer_dp.LAST_WORK_SHARES)
    assert len(shares) == n_devices and len(set(shares.values())) == 1, (
        f"OCR batch did not partition evenly across processes: {shares}")
    assert_same_across_processes("ocr wire", np.asarray(wire).tobytes())
    say(f"sharded OCR ok, decoded counts={packed[:, 0].tolist()}; "
        f"global work shares (strips/device): {shares}")

    # 3. sharded folio pipeline: byte-identical JSON vs unsharded and
    # across processes
    from ..models.recognizer import SeqRecognizer
    from ..pipeline.preprocess import PreprocParams
    from ..synth import make_page
    from .batch import process_batch

    rec = SeqRecognizer(params, codec, normalize_on_device=True)
    pp = PreprocParams(filter_size=8)
    folios = []
    for i in range(2):
        page = make_page(np.random.default_rng(60 + i), n_lines=3,
                         words_per_line=2)
        folios.append((page.image, page.transcript))
    single = process_batch(folios, rec, backend="device", preproc_params=pp)
    sharded = process_batch(folios, rec, backend="device", preproc_params=pp,
                            mesh=mesh1, min_align_device_cells=0)
    blobs = []
    for s, m in zip(single, sharded):
        a = None if s is None else json.dumps(s.json_dict, sort_keys=True)
        b = None if m is None else json.dumps(m.json_dict, sort_keys=True)
        assert a == b, "sharded folio pipeline diverged from single-device"
        blobs.append(b)
    assert_same_across_processes("folio json", blobs)
    shares = gather_shares(infer_dp.LAST_WORK_SHARES)
    assert len(shares) == n_devices, (
        f"folio-pipeline OCR did not shard across processes: {shares}")
    say(f"sharded folio pipeline ok, JSON byte-identical to unsharded and "
        f"across processes; folio-batch OCR shares: {shares}")

    # 4. sharded scoring grid
    from ..align.api import align_grid

    t = list("dominus vobiscum et cum spiritu tuo")
    o = list("domnus vobiscm et cvm spirjtu tuo")
    grid = [[8, -4, -7, -7, -3, 0], [5, -4, -2, -2, 0, 0],
            [11, -10, -7, -7, -5, -5], [8, -7, -5, -2, -3, 0],
            [5, -7, -7, -5, 0, -3], [11, -4, -2, -7, -5, 0],
            [8, -10, -5, -5, -3, -3], [5, -10, -2, -5, 0, -5]]
    got = align_grid(t, o, grid, mesh=mesh1)
    want = align_grid(t, o, grid)
    assert got == want, "sharded scoring grid diverged from single-device"
    assert_same_across_processes("grid", got)
    say(f"sharded scoring grid ok ({len(grid)} combos partitioned over "
        f"{n_processes} processes, bit-identical)")


def assert_same_across_processes(tag: str, value) -> None:
    """Certify ``value`` (any small picklable) is byte-identical on every
    process — the multihost analog of the single-vs-sharded JSON
    comparison. No-op single-process."""
    if not is_multiprocess():
        return
    import hashlib
    import pickle

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    h = hashlib.sha256(pickle.dumps(value)).digest()[:8]
    mine = np.frombuffer(h, np.uint8).astype(np.int32)
    allh = np.asarray(multihost_utils.process_allgather(jnp.asarray(mine)))
    assert (allh == allh[0]).all(), (
        f"{tag}: value differs across processes (hash rows {allh})")
