from tpu_sdr.control import golden, designer, commands  # noqa: F401
from tpu_sdr.control.api import SpectrumAnalyzer, AnalyzerStats  # noqa: F401
from tpu_sdr.control.commands import Command, CommandDecoder  # noqa: F401
from tpu_sdr.control.designer import (  # noqa: F401
    FilterDesign,
    design_iir_filter,
    sos_to_wire_bytes,
    wire_bytes_to_sos,
)
