from mqtt_message_pump_spark.operators import dedup, multimodal, similarity

__all__ = ["dedup", "multimodal", "similarity"]
