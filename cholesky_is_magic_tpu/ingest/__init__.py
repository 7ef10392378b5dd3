"""Host-side problem ingest: MPS files -> standard form -> device operands.

Reference parity: read-mps.lisp (full MPS dialect incl. OBJSENSE / RANGES /
BOUNDS), standard-form.lisp (slack insertion + row equilibration).  Everything
here is pure Python / NumPy; the output of :mod:`.device` is the static-shape,
padded operand set consumed by the jitted solvers.
"""

from cholesky_is_magic_tpu.ingest.mps import MPSData, read_mps, read_mps_file
from cholesky_is_magic_tpu.ingest.standard_form import (
    StandardForm,
    to_standard_form,
    rescale_sf,
    scale_constraints,
    extract_solution,
)
from cholesky_is_magic_tpu.ingest.device import DeviceLP, to_device_lp
from cholesky_is_magic_tpu.ingest.presolve import Presolve, presolve

__all__ = [
    "Presolve",
    "presolve",
    "MPSData",
    "read_mps",
    "read_mps_file",
    "StandardForm",
    "to_standard_form",
    "rescale_sf",
    "scale_constraints",
    "extract_solution",
    "DeviceLP",
    "to_device_lp",
]
