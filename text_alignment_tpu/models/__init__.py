from .codec import Codec
from .lstm_jax import BiLSTMParams, LSTMParams, bilstm_forward_batched, init_bilstm
from .recognizer import SeqRecognizer
from .pyrnn import load_pyrnn, save_pyrnn

__all__ = [
    "Codec",
    "LSTMParams",
    "BiLSTMParams",
    "bilstm_forward_batched",
    "init_bilstm",
    "SeqRecognizer",
    "load_pyrnn",
    "save_pyrnn",
]
