"""text_alignment_tpu — a TPU-native (JAX/XLA/Pallas) text-alignment framework.

Given an image of the text layer of a chant manuscript and a transcript of the
chant text on that page, locates every syllable of the transcript on the page
and emits a JSON list of syllable bounding boxes (capability parity with the
reference pipeline documented in SURVEY.md; reference: alignToOCR.py:187-351).

Layer map (TPU-first, not a translation):

- ``ops``       — batched image kernels over page tensors (binarize, despeckle,
                  connected components, run filters, skew/rotate, projections);
                  replaces the reference's Gamera C++ plugin calls.
- ``models``    — BiLSTM+CTC line recognizer (`lax.scan` over frames, batched
                  over bucketed line crops) + ``.pyrnn.gz`` weight loading;
                  replaces the `ocropus-rpred` subprocess.
- ``align``     — affine-gap Needleman–Wunsch: anti-diagonal wavefront fill on
                  device, host traceback; replaces textSeqCompare.py's O(N·M)
                  Python loop.
- ``lang``      — Latin syllabification + CANTUS CSV ingestion (host-side,
                  exact reference semantics).
- ``pipeline``  — orchestration: `process()` with the reference's public
                  return contract, JSON emission, assembly.
- ``parallel``  — device-mesh sharding (data parallelism over folios/lines).
- ``utils``     — stage timing/tracing, caches.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: TPU compiles here go through a remote
# tunnel and cost seconds-to-minutes; caching makes every process after the
# first start warm. Opt out with TEXT_ALIGNMENT_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("TEXT_ALIGNMENT_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "text_alignment_tpu_xla"),
        )
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # jax config API drift must never break imports
        pass

from .charbox import CharBox
from .textio import read_file

__all__ = ["CharBox", "read_file", "__version__"]
