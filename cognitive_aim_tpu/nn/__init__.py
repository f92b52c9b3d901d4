from cognitive_aim_tpu.nn import init, layers, dinov2  # noqa: F401
