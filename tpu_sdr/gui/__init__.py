from tpu_sdr.gui.backend import GuiBackend  # noqa: F401
from tpu_sdr.gui.server import serve  # noqa: F401
