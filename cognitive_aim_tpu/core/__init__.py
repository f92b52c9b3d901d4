from cognitive_aim_tpu.core.mesh import make_mesh, default_mesh_shape  # noqa: F401
from cognitive_aim_tpu.core.precision import Policy, DEFAULT_POLICY  # noqa: F401
