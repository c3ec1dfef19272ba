from mqtt_message_pump_spark.streaming.pump import (
    build_dual_path,
    run_batch_pump,
    start_stream_pump,
)
from mqtt_message_pump_spark.streaming.monitor import PumpMonitorListener

__all__ = [
    "build_dual_path",
    "run_batch_pump",
    "start_stream_pump",
    "PumpMonitorListener",
]
