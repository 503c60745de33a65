from neddf_tpu.viz.marching import marching_tetrahedra
from neddf_tpu.viz.mesh_io import compute_vertex_normals, export_dae, export_obj

__all__ = [
    "marching_tetrahedra",
    "compute_vertex_normals",
    "export_dae",
    "export_obj",
]
