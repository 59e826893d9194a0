"""toy_heaan_ckks_tpu — a TPU-native CKKS (HEAAN) homomorphic encryption
framework built from scratch in JAX/XLA/Pallas.

Capability parity with the reference library oiwn/toy-heaan-ckks (see
SURVEY.md), architected TPU-first: Montgomery limb arithmetic on uint32
pairs, CRT-tree negacyclic NTTs, NTT-resident ciphertexts, batched gadget
key switching, and RNS-channel sharding across device meshes.
"""

from .context import CkksContext
from .encoding.encoder import CkksEncoder
from .engine import CkksEngine, CkksEngineBuilder, CkksParams
from .keys import (
    PublicKey,
    RelinearizationKey,
    RnsGadgetRelinKey,
    RnsGadgetConjugationKey,
    RnsGadgetRotationKey,
    RotationKey,
    SecretKey,
    SecretKeyParams,
)
from .math.primes import (
    generate_primes,
    get_first_prime_down,
    get_first_prime_up,
    is_ntt_friendly_prime,
    is_prime,
)
from .ops.poly import Poly
from .types import Ciphertext, Plaintext
from . import native
from .keys import KeyLadder
from .utils import serialization
from .utils.params import build_modulus_chain

__version__ = "0.1.0"

__all__ = [
    "CkksContext",
    "CkksEncoder",
    "CkksEngine",
    "CkksEngineBuilder",
    "CkksParams",
    "Ciphertext",
    "Plaintext",
    "Poly",
    "PublicKey",
    "RelinearizationKey",
    "RnsGadgetRelinKey",
    "RnsGadgetConjugationKey",
    "RnsGadgetRotationKey",
    "RotationKey",
    "SecretKey",
    "SecretKeyParams",
    "KeyLadder",
    "build_modulus_chain",
    "generate_primes",
    "get_first_prime_down",
    "get_first_prime_up",
    "is_ntt_friendly_prime",
    "is_prime",
    "native",
    "serialization",
]
