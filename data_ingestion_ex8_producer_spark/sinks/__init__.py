from .encode import avro_value_frame  # noqa: F401
