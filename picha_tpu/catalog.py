"""Codec catalog.

The reference registered codecs at module init, feature-gated by
build-time probes (binding.gyp:2-7, picha.cc:187-270), exposing a
runtime-discoverable ``catalog`` keyed by mimetype in insertion order
jpeg, png, tiff, webp (picha.cc:205,226,247,268) — the same order the
format-sniffing stat/decode loops try (index.js:200-233).

Here each codec is a small object; registration is defensive so a
missing native library degrades the catalog instead of breaking import
(the same behaviour the reference got from pkg-config gating).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Protocol


class Codec(Protocol):
    mimetype: str
    encodes: List[str]

    def stat(self, buf: bytes) -> Optional[dict]: ...
    def decode_sync(self, buf: bytes, opts: dict): ...
    def encode_sync(self, img, opts: dict) -> bytes: ...


catalog: Dict[str, Codec] = {}


def _add_reference_aliases(codec: Codec) -> None:
    """The reference's catalog entries expose stat/decode/decodeSync
    (index.js:200-233 iterates them); give codec objects the same
    camelCase members plus async encode, so `catalog[mime].decode(...)`
    works as it did there."""
    from .runtime.executor import run_async

    def decode(buf, opts=None, cb=None):
        if callable(opts):
            cb, opts = opts, None
        return run_async(lambda: codec.decode_sync(buf, opts or {}), cb)

    def encode(img, opts=None, cb=None):
        if callable(opts):
            cb, opts = opts, None
        return run_async(lambda: codec.encode_sync(img, opts or {}), cb)

    codec.decode = decode
    codec.decodeSync = codec.decode_sync
    codec.encode = encode
    codec.encodeSync = codec.encode_sync


def register(codec: Codec) -> None:
    _add_reference_aliases(codec)
    catalog[codec.mimetype] = codec


def load_default_codecs() -> None:
    """Register jpeg, png, tiff, webp — in the reference's sniffing order."""
    import warnings

    for modname in ("jpeg", "png", "tiff", "webp"):
        try:
            mod = __import__(f"picha_tpu.codecs.{modname}", fromlist=["CODEC"])
            register(mod.CODEC)
        except Exception as e:  # noqa: BLE001 — feature-gated like binding.gyp
            warnings.warn(f"picha_tpu: {modname} codec unavailable: {e}")
