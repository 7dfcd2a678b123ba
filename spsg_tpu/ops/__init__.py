from . import depth, mesh, normals3d, raycast
