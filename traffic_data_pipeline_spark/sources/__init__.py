from traffic_data_pipeline_spark.sources.tables import TABLES, load_table  # noqa: F401
from traffic_data_pipeline_spark.sources.sensor import sensor_readings, detector_config  # noqa: F401
