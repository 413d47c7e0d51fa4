from tpu_sdr.control import golden  # noqa: F401
