"""Command-line tools: bwt_merge, bwt_convert, bwt_inspect.

Run as modules: python -m bwtmerge_tpu.cli.bwt_merge ...
Parity with the reference CLIs (bwt_merge.cpp, bwt_convert.cpp,
bwt_inspect.cpp); see each module for the flag mapping.
"""

from . import bwt_convert, bwt_inspect, bwt_merge  # noqa: F401
