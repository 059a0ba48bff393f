"""Secret-at-rest crypto (reference: lib/webhookdb/crypto.rb).

The reference encrypts each organization's data-encryption secret and
stored credentials with AES-256-CBC via ``OpenSSL::Cipher`` — with no
IV set, which OpenSSL treats as an all-zero IV, making the scheme
deterministic (their own spec pins an exact ciphertext). Values travel
as ``Boxed`` (raw bytes | urlsafe base64) pairs.

Golden vector (spec/webhookdb/crypto_spec.rb:6-14): key
``6vHQcB8xlVSmHO2Wxsqk713k7oi_SpIWirUG0YTGUa4=`` encrypting
``hello Boom`` yields ``mzre1LavjI7wUWdZRsYsUA==`` — pinned in
tests/test_converters.py.

This is driver-side key handling for integration secrets, not a
data-plane operator; column-level payload encryption at scale would
wrap these kernels in an Arrow-batched UDF, which nothing in the
reference requires.
"""

from __future__ import annotations

import base64
import os

try:  # pragma: no cover - import gate for minimal environments
    from cryptography.hazmat.primitives import padding
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    _HAVE_CRYPTO = True
except ImportError:  # pragma: no cover
    _HAVE_CRYPTO = False

_ZERO_IV = b"\x00" * 16


class Boxed:
    """A value held as raw bytes and/or urlsafe base64 (crypto.rb:38-66)."""

    def __init__(self, raw: bytes | None, b64: str | None):
        self._raw = raw
        self._b64 = b64

    @classmethod
    def from_raw(cls, bytestr: bytes) -> "Boxed":
        if bytestr is None:
            raise ValueError("bytes string cannot be nil")
        return cls(bytestr, None)

    @classmethod
    def from_b64(cls, b64str: str) -> "Boxed":
        if b64str is None:
            raise ValueError("base64 string cannot be nil")
        return cls(None, b64str)

    @property
    def base64(self) -> str:
        if self._b64 is None:
            self._b64 = base64.urlsafe_b64encode(self._raw).decode()
        return self._b64

    @property
    def raw(self) -> bytes:
        if self._raw is None:
            self._raw = base64.urlsafe_b64decode(self._b64)
        return self._raw


def bin2hex(s: bytes) -> str:
    return s.hex()


def encryption_key() -> Boxed:
    """Random 256-bit key (crypto.rb:13-16)."""
    return Boxed.from_raw(os.urandom(32))


def _require() -> None:
    if not _HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError(
            "cryptography package unavailable; cannot run AES-256-CBC"
        )


def encrypt_value(key: Boxed, value: Boxed) -> Boxed:
    """AES-256-CBC, zero IV, PKCS7 (crypto.rb:21-26)."""
    _require()
    enc = Cipher(algorithms.AES(key.raw), modes.CBC(_ZERO_IV)).encryptor()
    padder = padding.PKCS7(128).padder()
    data = padder.update(value.raw) + padder.finalize()
    return Boxed.from_raw(enc.update(data) + enc.finalize())


def decrypt_value(key: Boxed, value: Boxed) -> Boxed:
    """Inverse of :func:`encrypt_value` (crypto.rb:31-36)."""
    _require()
    dec = Cipher(algorithms.AES(key.raw), modes.CBC(_ZERO_IV)).decryptor()
    data = dec.update(value.raw) + dec.finalize()
    unpadder = padding.PKCS7(128).unpadder()
    return Boxed.from_raw(unpadder.update(data) + unpadder.finalize())
