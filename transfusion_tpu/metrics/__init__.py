from transfusion_tpu.metrics.sta_map import STAMeanAveragePrecision, STA_METRIC_NAMES

__all__ = ["STAMeanAveragePrecision", "STA_METRIC_NAMES"]
