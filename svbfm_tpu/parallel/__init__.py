from svbfm_tpu.parallel.mesh import make_mesh, DATA_AXIS  # noqa: F401
