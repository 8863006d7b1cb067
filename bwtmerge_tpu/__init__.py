"""bwtmerge_tpu — a TPU-native BWT-merge framework.

A from-scratch re-design of the capabilities of jltsiren/bwt-merge for TPU
hardware: JAX/XLA/Pallas on the compute path (batched LF/rank kernels, wavefront
search, segmented interleave), C++ on the byte-codec/IO runtime.

See DESIGN.md for the architecture and SURVEY.md for the reference analysis.
"""

__version__ = "0.1.0"

from .utils.alphabet import Alphabet, AlphabeticOrder, create_alphabet, identify_alphabet
from .models.runs import RunArrays
from .models.fmi import FMI, load_fmi, serialize_fmi
from .models.merge import MergeConfig, merge_fmi, merge_fmi_to_file

__all__ = [
    "Alphabet",
    "AlphabeticOrder",
    "create_alphabet",
    "identify_alphabet",
    "RunArrays",
    "FMI",
    "load_fmi",
    "serialize_fmi",
    "MergeConfig",
    "merge_fmi",
    "merge_fmi_to_file",
    "__version__",
]
