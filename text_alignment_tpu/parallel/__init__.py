from .mesh import make_mesh, data_model_mesh
from .train_dp import make_sharded_train_step, sharded_train_demo_step

__all__ = [
    "make_mesh",
    "data_model_mesh",
    "make_sharded_train_step",
    "sharded_train_demo_step",
]
