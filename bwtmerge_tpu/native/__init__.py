"""Native C++ runtime bindings (codecs, format IO, interleave, spill merge).

The shared library is built on demand from native/src via g++ (no pip deps);
see native/build.py. Importing names from this package raises ImportError when
the library is unavailable so callers can fall back to numpy backends.
"""

from .build import load_library  # noqa: F401

try:
    from .api import (  # noqa: F401
        rle_hash,
        fnv1a_bytes,
        rle_decode,
        rle_encode,
        rle_encode_at,
        interleave_native,
        interleave_streaming,
        interleave_stream_chunks,
        ra_encode,
        ra_merge_pair,
        ra_decode_chunk,
        ra_decode_nib_chunk,
        ra_decode_q4_chunk,
        sga_stream_chunk,
        native_stream_chunk,
        fragment_phase_table,
        nib4_pack,
    )
except Exception as _e:  # pragma: no cover - fallback path
    raise ImportError(f"native runtime unavailable: {_e}") from _e
