"""Model-level algorithms built on the crypto engine.

- ``algorithms``: slot sums, level alignment, Horner evaluation,
  encrypted std-dev (the reference's specs/ctx.md item list).
- ``bootstrap``: modulus raising, CoeffToSlot/SlotToCoeff, EvalMod,
  full ciphertext refresh (beyond the reference).
- ``funceval``: arbitrary smooth functions on encrypted inputs via
  Chebyshev fits + Paterson-Stockmeyer evaluation (beyond the
  reference).
- ``compare``: encrypted sign / compare / abs / max / min / ReLU via
  CKK20 composite polynomials (beyond the reference).
- ``linalg``: encrypted matrix-vector products (diagonal method,
  double-hoisted or BSGS), encrypted matrix-matrix products (JKLS,
  both operands encrypted) and transpose (beyond the reference).
"""

from .algorithms import (  # noqa: F401
    align_level,
    encrypted_std_dev,
    eval_poly_horner,
    normalize_scale,
    sum_slots,
    sum_slots_hoisted,
)
from .bootstrap import (  # noqa: F401
    BootstrapKeys,
    bootstrap,
    coeff_to_slot,
    eval_chebyshev,
    eval_mod,
    raise_modulus,
    slot_to_coeff,
)
from .compare import (  # noqa: F401
    compare,
    eval_abs,
    eval_max,
    eval_min,
    eval_relu,
    eval_sign,
    plan_sign_iterations,
)
from .funceval import (  # noqa: F401
    chebyshev_fit,
    eval_chebyshev_ps,
    eval_exp,
    eval_function,
    eval_inverse,
    eval_sigmoid,
)
from .linalg import (  # noqa: F401
    encrypted_matmul,
    encrypted_matvec,
    encrypted_transpose,
    matrix_diagonals,
)
