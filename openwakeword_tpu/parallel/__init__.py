from openwakeword_tpu.parallel.engine import MultiStreamEngine
from openwakeword_tpu.parallel.bulk import bulk_predict
from openwakeword_tpu.parallel.server import StreamServer

__all__ = ["MultiStreamEngine", "bulk_predict", "StreamServer"]
