from mqtt_message_pump_spark.functions.flatten import (
    explode_records,
    flatten_struct,
    flattened_leaf_columns,
)
from mqtt_message_pump_spark.functions.inference import (
    SchemaDrift,
    infer_flat_schema,
    infer_spark_schema,
    sample_record_schema,
)
from mqtt_message_pump_spark.functions.ids import with_message_id

__all__ = [
    "explode_records",
    "flatten_struct",
    "flattened_leaf_columns",
    "SchemaDrift",
    "infer_flat_schema",
    "infer_spark_schema",
    "sample_record_schema",
    "with_message_id",
]
