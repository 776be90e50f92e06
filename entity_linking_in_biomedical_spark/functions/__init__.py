from .normalize import norm_key
from .ngrams import char_ngrams, minhash_signature, lsh_band_keys
from .vectors import cosine_sim, dot_product, l2_normalize

__all__ = [
    "norm_key",
    "char_ngrams",
    "minhash_signature",
    "lsh_band_keys",
    "cosine_sim",
    "dot_product",
    "l2_normalize",
]
