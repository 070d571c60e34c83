from mudpt_tpu.data.datum import Datum, DatasetBase, subsample_classes
from mudpt_tpu.data.manager import DataManager

__all__ = ["Datum", "DatasetBase", "subsample_classes", "DataManager"]
