"""Hand-assembled genuine Python-2 pickle of an ocrolib SeqRecognizer.

The reference's checkpoints are gzipped pickles written by Python 2.7 +
numpy 1.15 (reference alignToOCR.py:27-31, README.md:11). Those streams
differ from anything a Python-3 pickler can produce:

- ocrolib's classes are OLD-STYLE (``class Network:``), so instances pickle
  with the OBJ opcode (MARK + GLOBAL + 'o'), not NEWOBJ/REDUCE;
- every py2 ``str`` payload (attribute names aside — raw array data, dtype
  codes, charset entries) is a SHORT_BINSTRING/BINSTRING, which a py3
  unpickler must decode latin1;
- numpy 1.15 reduces arrays via ``numpy.core.multiarray._reconstruct`` with
  args ``(ndarray, (0,), 'b')`` and a BUILD state
  ``(1, shape, dtype, False, data_str)`` where the dtype itself reduces via
  ``numpy.dtype('f4', 0, 1)`` + an 8-tuple state.

This module emits that byte stream opcode by opcode so the loader's claim —
"loads the original checkpoints without ocrolib" — is tested against the
real container format, not just our own py3 writer (tests/test_models.py).
"""

from __future__ import annotations

import struct

import numpy as np

PROTO = b"\x80\x02"
MARK = b"("
STOP = b"."
NONE = b"N"
NEWTRUE = b"\x88"
NEWFALSE = b"\x89"
REDUCE = b"R"
BUILD = b"b"
OBJ = b"o"
EMPTY_DICT = b"}"
SETITEMS = b"u"
EMPTY_LIST = b"]"
APPENDS = b"e"
TUPLE = b"t"
TUPLE1 = b"\x85"
TUPLE2 = b"\x86"
TUPLE3 = b"\x87"


def _global(module: str, name: str) -> bytes:
    return b"c" + module.encode("ascii") + b"\n" + name.encode("ascii") + b"\n"


def _short_binstring(b: bytes) -> bytes:
    assert len(b) < 256
    return b"U" + bytes([len(b)]) + b


def _binstring(b: bytes) -> bytes:
    return b"T" + struct.pack("<i", len(b)) + b


def _py2_str(b: bytes) -> bytes:
    return _short_binstring(b) if len(b) < 256 else _binstring(b)


def _binunicode(s: str) -> bytes:
    u = s.encode("utf-8")
    return b"X" + struct.pack("<I", len(u)) + u


def _int(n: int) -> bytes:
    if 0 <= n < 256:
        return b"K" + bytes([n])
    if 0 <= n < 65536:
        return b"M" + struct.pack("<H", n)
    return b"J" + struct.pack("<i", n)


def _tuple(*items: bytes) -> bytes:
    if len(items) == 0:
        return b")"
    if len(items) == 1:
        return items[0] + TUPLE1
    if len(items) == 2:
        return b"".join(items) + TUPLE2
    if len(items) == 3:
        return b"".join(items) + TUPLE3
    return MARK + b"".join(items) + TUPLE


def _dtype(code: bytes) -> bytes:
    # numpy.dtype('f4', 0, 1) + __setstate__((3, '<', None, None, None,
    # -1, -1, 0)) — the numpy-1.15 reduce form
    out = _global("numpy", "dtype")
    out += _tuple(_py2_str(code), _int(0), _int(1)) + REDUCE
    out += _tuple(_int(3), _py2_str(b"<"), NONE, NONE, NONE,
                  b"J" + struct.pack("<i", -1), b"J" + struct.pack("<i", -1),
                  _int(0)) + BUILD
    return out


def _ndarray(a: np.ndarray) -> bytes:
    a = np.ascontiguousarray(a)
    code = {np.float32: b"f4", np.float64: b"f8"}[a.dtype.type]
    out = _global("numpy.core.multiarray", "_reconstruct")
    out += _tuple(_global("numpy", "ndarray"), _tuple(_int(0)),
                  _py2_str(b"b")) + REDUCE
    shape = _tuple(*[_int(d) for d in a.shape])
    state = _tuple(_int(1), shape, _dtype(code), NEWFALSE,
                   _binstring(a.tobytes()))
    return out + state + BUILD


def _dict(items) -> bytes:
    return EMPTY_DICT + MARK + b"".join(k + v for k, v in items) + SETITEMS


def _list(items) -> bytes:
    return EMPTY_LIST + MARK + b"".join(items) + APPENDS


def _obj(module: str, name: str, state_items) -> bytes:
    """Old-style class instance: OBJ opcode + BUILD with a dict state."""
    return (MARK + _global(module, name) + OBJ
            + _dict(state_items) + BUILD)


def build_py2_pyrnn(params: dict, charset: list[str],
                    target_height: int = 48) -> bytes:
    """Protocol-2 byte stream of an ocrolib.lstm.SeqRecognizer holding
    ``params`` ({'fwd'/'bwd': {WGI..WOP}, 'W2'}) and ``charset``.
    Mirrors the object graph ocropus-rtrain checkpoints carry:
    Stacked[Parallel[LSTM, Reversed[LSTM]], Softmax] + Codec + lnorm,
    including the runtime buffers real pickles retain."""
    keys = ("WGI", "WGF", "WGO", "WCI", "WIP", "WFP", "WOP")

    def lstm(d):
        ns, na = d["WGI"].shape
        items = [(_py2_str(k.encode()), _ndarray(np.asarray(d[k], np.float32)))
                 for k in keys]
        items += [
            (_py2_str(b"ns"), _int(ns)),
            (_py2_str(b"na"), _int(na)),
            (_py2_str(b"ni"), _int(na - ns - 1)),
            # runtime activation buffers (ocropy pickles keep them)
            (_py2_str(b"source"), _ndarray(np.zeros((2, na), np.float64))),
            (_py2_str(b"output"), _ndarray(np.zeros((2, ns), np.float64))),
        ]
        return _obj("ocrolib.lstm", "LSTM", items)

    fwd = lstm(params["fwd"])
    bwd = lstm(params["bwd"])
    rev = _obj("ocrolib.lstm", "Reversed",
               [(_py2_str(b"net"), bwd)])
    par = _obj("ocrolib.lstm", "Parallel",
               [(_py2_str(b"nets"), _list([fwd, rev]))])
    soft = _obj("ocrolib.lstm", "Softmax", [
        (_py2_str(b"W2"), _ndarray(np.asarray(params["W2"], np.float32))),
        (_py2_str(b"DW2"), _ndarray(np.zeros_like(
            np.asarray(params["W2"], np.float32)))),
    ])
    stack = _obj("ocrolib.lstm", "Stacked",
                 [(_py2_str(b"nets"), _list([par, soft]))])

    # py2 Codec: code2char maps int -> unicode, but pure-ASCII entries were
    # often plain py2 str — emit a mix so the loader sees both forms
    def charval(i, c):
        if c and i % 2 == 0 and all(ord(ch) < 128 for ch in c):
            return _py2_str(c.encode("ascii"))
        return _binunicode(c)

    code2char = _dict([(_int(i), charval(i, c)) for i, c in enumerate(charset)])
    char2code = _dict([(charval(i, c), _int(i)) for i, c in enumerate(charset)])
    codec = _obj("ocrolib.lstm", "Codec", [
        (_py2_str(b"code2char"), code2char),
        (_py2_str(b"char2code"), char2code),
    ])
    lnorm = _obj("ocrolib.lineest", "CenterNormalizer", [
        (_py2_str(b"target_height"), _int(target_height)),
        (_py2_str(b"range"), _int(4)),
        (_py2_str(b"smoothness"), _ndarray(np.asarray([1.0], np.float64))),
    ])
    rec = _obj("ocrolib.lstm", "SeqRecognizer", [
        (_py2_str(b"lstm"), stack),
        (_py2_str(b"codec"), codec),
        (_py2_str(b"lnorm"), lnorm),
        (_py2_str(b"Ni"), _int(target_height)),
        (_py2_str(b"No"), _int(len(charset))),
        (_py2_str(b"trial"), _int(54500)),
    ])
    return PROTO + rec + STOP


NEWOBJ = b"\x81"


def _py2_charbox(char, ul=None, lr=None) -> bytes:
    """One ``alignToOCR.CharBox`` as py2 cPickle protocol 2 emits a
    new-style ``__slots__`` instance: GLOBAL + empty args + NEWOBJ, then
    BUILD with ``(None, slots_dict)`` state (reference alignToOCR.py:35-58,
    dumped at :435-436). ``char`` bytes = a py2 plain ``str`` payload;
    ``str`` = a py2 ``unicode`` payload (the llocs path read via codecs)."""
    c = _py2_str(char) if isinstance(char, bytes) else _binunicode(char)
    if ul is None or lr is None:
        # the reference's "empty" state: __init__ sets ul/lr None and
        # leaves the derived slots UNSET (alignToOCR.py:39-44)
        slots = [
            (_py2_str(b"char"), c),
            (_py2_str(b"ul"), NONE),
            (_py2_str(b"lr"), NONE),
        ]
    else:
        slots = [
            (_py2_str(b"char"), c),
            (_py2_str(b"ul"), _tuple(_int(ul[0]), _int(ul[1]))),
            (_py2_str(b"lr"), _tuple(_int(lr[0]), _int(lr[1]))),
            (_py2_str(b"ulx"), _int(ul[0])),
            (_py2_str(b"lrx"), _int(lr[0])),
            (_py2_str(b"uly"), _int(ul[1])),
            (_py2_str(b"lry"), _int(lr[1])),
            (_py2_str(b"width"), _int(lr[0] - ul[0])),
            (_py2_str(b"height"), _int(lr[1] - ul[1])),
        ]
    return (_global("alignToOCR", "CharBox") + b")" + NEWOBJ
            + _tuple(NONE, _dict(slots)) + BUILD)


def build_py2_charbox_pickle(boxes) -> bytes:
    """Protocol-2 byte stream of a CharBox list — the reference's
    ``pik/{fname}_boxes.pickle`` container (alignToOCR.py:435-436).
    ``boxes``: iterable of (char, ul, lr) with ul/lr (x, y) tuples or
    None."""
    return PROTO + _list([_py2_charbox(*b) for b in boxes]) + STOP
