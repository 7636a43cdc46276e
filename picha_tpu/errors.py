"""Error taxonomy for picha_tpu.

Mirrors the reference's error surface (jhs67/picha): invalid image /
unsupported format / invalid options are distinct, catchable failures
(reference: src/picha.cc:61-85 "invalid image", index.js:215
"unsupported image file", src/resize.cc:184 "invalid filter mode").
"""


class PichaError(Exception):
    """Base class for all picha_tpu errors."""


class InvalidImageError(PichaError):
    """The image object/buffer is malformed (bad dims, short data, bad stride)."""


class InvalidOptionsError(PichaError):
    """An options value is out of range or unknown (bad filter, pixel, preset...)."""


class UnsupportedFormatError(PichaError):
    """No codec recognises the supplied bytes (reference: index.js:215)."""


class CodecError(PichaError):
    """A codec failed while parsing/producing a bitstream (truncated file,
    bad CRC, entropy-decode failure...)."""


def _malformed_excs():
    """The exception classes a crafted bitstream can legitimately raise
    out of a pure-Python parser (fuzz-found set). Codec boundary traps
    convert exactly these to CodecError — one shared tuple so the PNG
    and TIFF traps cannot drift apart."""
    import struct
    import zlib

    return (ValueError, TypeError, IndexError, KeyError, struct.error,
            zlib.error, OverflowError, MemoryError, ZeroDivisionError)


MALFORMED_EXCS = _malformed_excs()
