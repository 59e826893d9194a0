"""Key / ciphertext serialization (checkpoint-resume).

The reference declares serde but never serializes anything — keys live
only in memory and are regenerated per level (SURVEY.md §5 "Checkpoint /
resume: absent"). Here the durable format is a plain ``.npz``: uint32 limb
arrays plus a JSON header of static metadata, so artifacts survive process
restarts and can be shipped between hosts. Device arrays are pulled to
host once at save and re-uploaded lazily on load.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from ..context import CkksContext
from ..keys import (
    PublicKey,
    RnsGadgetRelinKey,
    RnsGadgetRotationKey,
    SecretKey,
)
from ..ops.poly import Poly
from ..types import Ciphertext, Plaintext


def _meta(ctx: CkksContext, **extra) -> str:
    return json.dumps(
        {"moduli": [str(m) for m in ctx.moduli], "degree": ctx.degree, **extra}
    )


def _ctx_from(meta: dict) -> CkksContext:
    return CkksContext.build(
        tuple(int(m) for m in meta["moduli"]), int(meta["degree"])
    )


def save_ciphertext(path: str, ct: Ciphertext) -> None:
    np.savez_compressed(
        path,
        c0=np.asarray(ct.c0.data),
        c1=np.asarray(ct.c1.data),
        meta=_meta(
            ct.ctx,
            logp=ct.logp,
            logq=ct.logq,
            ntt_domain=ct.c0.ntt_domain,
            scale=ct.scale,
        ),
    )


def load_ciphertext(path: str) -> Ciphertext:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    ctx = _ctx_from(meta)
    ntt = bool(meta["ntt_domain"])
    return Ciphertext(
        c0=Poly(jnp.asarray(z["c0"]), ctx, ntt),
        c1=Poly(jnp.asarray(z["c1"]), ctx, ntt),
        logp=int(meta["logp"]),
        logq=int(meta["logq"]),
        scale=meta.get("scale"),
    )


def save_plaintext(path: str, pt: Plaintext) -> None:
    np.savez_compressed(
        path,
        poly=np.asarray(pt.poly.data),
        meta=_meta(
            pt.ctx,
            scale_bits=pt.scale_bits,
            slots=pt.slots,
            ntt_domain=pt.poly.ntt_domain,
            scale=pt.scale,
        ),
    )


def load_plaintext(path: str) -> Plaintext:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    ctx = _ctx_from(meta)
    return Plaintext(
        poly=Poly(jnp.asarray(z["poly"]), ctx, bool(meta["ntt_domain"])),
        scale_bits=int(meta["scale_bits"]),
        slots=int(meta["slots"]),
        scale=meta.get("scale"),
    )


def save_secret_key(path: str, sk: SecretKey) -> None:
    np.savez_compressed(
        path,
        poly=np.asarray(sk.poly.data),
        coeffs=np.asarray(sk.coeffs, dtype=np.int64),
        meta=_meta(sk.poly.ctx),
    )


def load_secret_key(path: str) -> SecretKey:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    ctx = _ctx_from(meta)
    return SecretKey(
        poly=Poly(jnp.asarray(z["poly"]), ctx, True),
        coeffs=np.asarray(z["coeffs"]),
    )


def save_public_key(path: str, pk: PublicKey) -> None:
    ctx = pk.a.ctx
    np.savez_compressed(
        path, a=np.asarray(pk.a.data), b=np.asarray(pk.b.data), meta=_meta(ctx)
    )


def load_public_key(path: str) -> PublicKey:
    z = np.load(path, allow_pickle=False)
    ctx = _ctx_from(json.loads(str(z["meta"])))
    return PublicKey(
        a=Poly(jnp.asarray(z["a"]), ctx, True),
        b=Poly(jnp.asarray(z["b"]), ctx, True),
    )


def _save_gadget(path, key, compress: bool = False, **extra) -> None:
    """``compress=True`` omits the uniform ``a`` stack and stores only its
    64-bit generation seed (keys.py:_gadget_pairs draws ``a`` from a
    dedicated seed precisely so it can be re-derived bit-identically on
    load) — half the bytes at rest/in flight. The reference persists no
    keys at all (SURVEY.md §5 checkpoint row); this is the standard
    public-seed compression of production FHE libraries."""
    arrays = {"b": np.asarray(key.b)}
    extra = dict(extra)
    if compress and key.a_seed is not None:
        extra["a_seed"] = str(int(key.a_seed))
        extra["num_digits"] = int(key.a.shape[0])
    else:
        arrays["a"] = np.asarray(key.a)
        if key.a_seed is not None:
            extra["a_seed"] = str(int(key.a_seed))
    np.savez_compressed(
        path,
        **arrays,
        meta=_meta(
            key.ctx,
            ext_moduli=[str(m) for m in key.ext_ctx.moduli],
            special=str(key.special),
            digit_size=key.digit_size,
            **extra,
        ),
    )


def _load_gadget_a(z, meta, ext_ctx):
    """The stored ``a`` stack, or its bit-identical regeneration from the
    compression seed when the file was written with compress=True."""
    if "a" in getattr(z, "files", ()):
        return jnp.asarray(z["a"]), _meta_seed(meta)
    from ..keys import regenerate_gadget_a

    return (
        regenerate_gadget_a(
            ext_ctx, int(meta["num_digits"]), int(meta["a_seed"])
        ),
        int(meta["a_seed"]),
    )


def _meta_seed(meta):
    return int(meta["a_seed"]) if "a_seed" in meta else None


def save_relin_key(path: str, key: RnsGadgetRelinKey,
                   compress: bool = False) -> None:
    _save_gadget(path, key, compress=compress)


def load_relin_key(path: str) -> RnsGadgetRelinKey:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    ctx = _ctx_from(meta)
    ext_ctx = CkksContext.build(
        tuple(int(m) for m in meta["ext_moduli"]), ctx.degree
    )
    a, a_seed = _load_gadget_a(z, meta, ext_ctx)
    return RnsGadgetRelinKey(
        a=a,
        b=jnp.asarray(z["b"]),
        ctx=ctx,
        ext_ctx=ext_ctx,
        special=int(meta["special"]),
        digit_size=int(meta["digit_size"]),
        a_seed=a_seed,
    )


def save_rotation_key(path: str, key: RnsGadgetRotationKey,
                      compress: bool = False) -> None:
    _save_gadget(path, key, compress=compress, rotation=key.rotation)


def load_rotation_key(path: str) -> RnsGadgetRotationKey:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    ctx = _ctx_from(meta)
    ext_ctx = CkksContext.build(
        tuple(int(m) for m in meta["ext_moduli"]), ctx.degree
    )
    a, a_seed = _load_gadget_a(z, meta, ext_ctx)
    return RnsGadgetRotationKey(
        a=a,
        b=jnp.asarray(z["b"]),
        rotation=int(meta["rotation"]),
        ctx=ctx,
        ext_ctx=ext_ctx,
        special=int(meta["special"]),
        digit_size=int(meta["digit_size"]),
        a_seed=a_seed,
    )


def save_conjugation_key(path: str, key, compress: bool = False) -> None:
    _save_gadget(path, key, compress=compress)


def load_conjugation_key(path: str):
    from ..keys import RnsGadgetConjugationKey

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    ctx = _ctx_from(meta)
    ext_ctx = CkksContext.build(
        tuple(int(m) for m in meta["ext_moduli"]), ctx.degree
    )
    a, a_seed = _load_gadget_a(z, meta, ext_ctx)
    return RnsGadgetConjugationKey(
        a=a,
        b=jnp.asarray(z["b"]),
        ctx=ctx,
        ext_ctx=ext_ctx,
        special=int(meta["special"]),
        digit_size=int(meta["digit_size"]),
        a_seed=a_seed,
    )
