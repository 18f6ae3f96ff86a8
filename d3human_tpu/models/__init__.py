from d3human_tpu.models import fields, texture  # noqa: F401
