"""Ciphertext / key serialization with optional compression.

The reference's perf suite times evaluator serialization with and without
zlib/zstd compression (profile_framewk/src/framewk.cpp "serialize" rows and
its Serializable<> save paths).  This module is the framework-native
equivalent: a versioned binary envelope around the device arrays, with
compression modes 'none' | 'zlib' | 'lzma' (zstd is not in this image; lzma
plays its high-ratio role and is gated the same way zstd is in SEAL builds).

Envelope layout (little-endian):
    magic   b"RFHE"              4 bytes
    version u8                   (currently 1)
    comp    u8                   0=none 1=zlib 2=lzma
    hlen    u32                  JSON header length
    header  hlen bytes           JSON: kind, dtype, shapes, metadata
    payload (compressed) bytes   raw C-order array data, concatenated

Fresh SYMMETRIC-KEY encryptions support *seeded* serialization (SEAL's
Serializable<Ciphertext> semantics): CkksContext.encrypt_seeded samples c1
uniformly from a seeded SHAKE-256 stream (sample_uniform_a below — the
expansion stream is part of the wire format, version 2), so the wire blob
carries only c0 plus the 32-byte seed, halving the size.
serialize_ciphertext_seeded VALIDATES that the seed regenerates c1 and
refuses otherwise — a public-key encryption's c1 = pk.a·u + e1 is NOT
seed-expandable and must use serialize_ciphertext.
"""
from __future__ import annotations

import json
import lzma
import struct
import zlib
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from .ckks import Ciphertext
from .keys import KeySwitchKey, PublicKey
from .rns import RnsPoly

_MAGIC = b"RFHE"
_VERSION = 2
_COMP = {"none": 0, "zlib": 1, "lzma": 2}
_COMP_INV = {v: k for k, v in _COMP.items()}


def _compress(raw: bytes, comp: str) -> bytes:
    if comp == "none":
        return raw
    if comp == "zlib":
        return zlib.compress(raw, level=6)
    if comp == "lzma":
        return lzma.compress(raw, preset=1)
    raise ValueError(f"unknown compression {comp!r}")


def _decompress(payload: bytes, comp: str) -> bytes:
    if comp == "none":
        return payload
    if comp == "zlib":
        return zlib.decompress(payload)
    if comp == "lzma":
        return lzma.decompress(payload)
    raise ValueError(f"unknown compression {comp!r}")


def _pack(kind: str, arrays: List[np.ndarray], meta: Dict,
          comp: str) -> bytes:
    header = {
        "kind": kind,
        "dtype": [str(a.dtype) for a in arrays],
        "shape": [list(a.shape) for a in arrays],
        "meta": meta,
    }
    # force little-endian on the wire (payload and header dtype strings)
    arrays = [np.ascontiguousarray(a).astype(a.dtype.newbyteorder("<"),
                                             copy=False) for a in arrays]
    header["dtype"] = [a.dtype.str for a in arrays]
    hjson = json.dumps(header, separators=(",", ":")).encode()
    raw = b"".join(a.tobytes() for a in arrays)
    payload = _compress(raw, comp)
    return (_MAGIC + struct.pack("<BBI", _VERSION, _COMP[comp], len(hjson))
            + hjson + payload)


def _unpack(data: bytes) -> Tuple[str, List[np.ndarray], Dict]:
    if data[:4] != _MAGIC:
        raise ValueError("not an RFHE serialized object")
    version, comp_id, hlen = struct.unpack("<BBI", data[4:10])
    if version not in (1, _VERSION):
        raise ValueError(f"unsupported version {version}")
    header = json.loads(data[10:10 + hlen])
    if version == 1 and header.get("kind") == "ciphertext_seeded":
        # the seed-expansion stream is part of the version-2 wire format;
        # plain ciphertexts/keys are byte-identical between versions
        raise ValueError("seeded ciphertexts require version 2 blobs")
    raw = _decompress(data[10 + hlen:], _COMP_INV[comp_id])
    arrays, off = [], 0
    for dt, shp in zip(header["dtype"], header["shape"]):
        a = np.frombuffer(raw, dtype=np.dtype(dt), offset=off,
                          count=int(np.prod(shp, dtype=np.int64)))
        arrays.append(a.reshape(shp))
        off += a.nbytes
    return header["kind"], arrays, header["meta"]


# -- ciphertexts --------------------------------------------------------------

def serialize_ciphertext(ct: Ciphertext, compression: str = "none") -> bytes:
    arrays = [np.asarray(p.data) for p in ct.c]
    meta = {"scale": ct.scale, "correction": ct.correction,
            "is_ntt": [bool(p.is_ntt) for p in ct.c]}
    return _pack("ciphertext", arrays, meta, compression)


def deserialize_ciphertext(data: bytes) -> Ciphertext:
    kind, arrays, meta = _unpack(data)
    if kind != "ciphertext":
        raise ValueError(f"expected ciphertext, got {kind}")
    polys = [RnsPoly(jnp.asarray(a), ntt)
             for a, ntt in zip(arrays, meta["is_ntt"])]
    return Ciphertext(c=polys, scale=meta["scale"],
                      correction=meta["correction"])


# -- keys ----------------------------------------------------------------------

def serialize_public_key(pk: PublicKey, compression: str = "none") -> bytes:
    return _pack("public_key", [np.asarray(pk.b), np.asarray(pk.a)], {},
                 compression)


def deserialize_public_key(data: bytes) -> PublicKey:
    kind, arrays, _ = _unpack(data)
    if kind != "public_key":
        raise ValueError(f"expected public_key, got {kind}")
    return PublicKey(b=jnp.asarray(arrays[0]), a=jnp.asarray(arrays[1]))


def serialize_keyswitch_key(ksk: KeySwitchKey,
                            compression: str = "none") -> bytes:
    return _pack("keyswitch_key", [np.asarray(ksk.b), np.asarray(ksk.a)], {},
                 compression)


def deserialize_keyswitch_key(data: bytes) -> KeySwitchKey:
    kind, arrays, _ = _unpack(data)
    if kind != "keyswitch_key":
        raise ValueError(f"expected keyswitch_key, got {kind}")
    return KeySwitchKey(b=jnp.asarray(arrays[0]), a=jnp.asarray(arrays[1]))


# -- seeded fresh ciphertexts (SEAL Serializable<Ciphertext> analog) ----------

def serialize_ciphertext_seeded(ct: Ciphertext, seed: int, moduli,
                                compression: str = "none") -> bytes:
    """Fresh symmetric encryption (CkksContext.encrypt_seeded) where c1 was
    sampled uniformly from `seed`: ship only c0 plus the seed (half the
    polynomials on the wire).  Raises if the seed does not regenerate
    ct.c[1] — e.g. for public-key encryptions, whose c1 is not expandable."""
    if ct.size != 2:
        raise ValueError("seeded form requires a fresh 2-poly ciphertext")
    c1 = np.asarray(ct.c[1].data)
    if not np.array_equal(c1, sample_uniform_a(seed, c1.shape, moduli)):
        raise ValueError(
            "seed does not regenerate c1: only ciphertexts produced by "
            "encrypt_seeded(seed=...) can use the seeded wire form")
    arrays = [np.asarray(ct.c[0].data)]
    meta = {"scale": ct.scale, "correction": ct.correction,
            "is_ntt": [bool(ct.c[0].is_ntt)], "seed": int(seed),
            "c1_shape": list(ct.c[1].data.shape),
            "c1_is_ntt": bool(ct.c[1].is_ntt)}
    return _pack("ciphertext_seeded", arrays, meta, compression)


def deserialize_ciphertext_seeded(data: bytes, moduli) -> Ciphertext:
    """Regenerate c1 from the stored seed (same PRNG stream as the
    serializer's `sample_uniform_a`)."""
    kind, arrays, meta = _unpack(data)
    if kind != "ciphertext_seeded":
        raise ValueError(f"expected ciphertext_seeded, got {kind}")
    shape = meta["c1_shape"]
    a = sample_uniform_a(meta["seed"], tuple(shape), moduli)
    c0 = RnsPoly(jnp.asarray(arrays[0]), meta["is_ntt"][0])
    c1 = RnsPoly(jnp.asarray(a), meta["c1_is_ntt"])
    return Ciphertext(c=[c0, c1], scale=meta["scale"],
                      correction=meta["correction"])


def sample_uniform_a(seed: int, shape, moduli) -> np.ndarray:
    """Deterministic uniform RNS sample (limb i < moduli[i]) used by the
    seeded-ciphertext wire format (version 2 stream, frozen):

    limb i is rejection-sampled from little-endian u32 words of
    SHAKE-256(seed_32le || i_4le || counter_4le), seed_32le = seed mod 2^256.
    SHAKE-256 is a crypto XOF, so the expanded `a` meets the RLWE uniformity
    requirement (the round-1 numpy-PCG64 stream did not — ADVICE r1)."""
    import hashlib
    seed_b = (int(seed) % (1 << 256)).to_bytes(32, "little")
    out = np.empty(shape, dtype=np.uint32)
    n_el = int(np.prod(shape[1:], dtype=np.int64))
    for i, q in enumerate(int(m) for m in moduli[:shape[0]]):
        bound = ((1 << 32) // q) * q
        vals, ctr = [], 0
        need = n_el
        while need > 0:
            xof = hashlib.shake_256(
                seed_b + i.to_bytes(4, "little") + ctr.to_bytes(4, "little"))
            words = np.frombuffer(xof.digest(4 * (need + need // 4 + 16)),
                                  dtype="<u4")
            keep = words[words < bound]
            vals.append(keep[:need])
            need -= len(vals[-1])
            ctr += 1
        out[i] = (np.concatenate(vals) % q).reshape(shape[1:])
    return out
