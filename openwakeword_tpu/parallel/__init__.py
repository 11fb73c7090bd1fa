from openwakeword_tpu.parallel.engine import MultiStreamEngine
from openwakeword_tpu.parallel.bulk import bulk_predict

__all__ = ["MultiStreamEngine", "bulk_predict"]
