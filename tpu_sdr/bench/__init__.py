from tpu_sdr.bench.roofline import pipeline_cost, roofline_report  # noqa: F401
