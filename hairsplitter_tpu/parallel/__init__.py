from .mesh import make_mesh, phase_shard_step, make_phase_example

__all__ = ["make_mesh", "phase_shard_step", "make_phase_example"]
