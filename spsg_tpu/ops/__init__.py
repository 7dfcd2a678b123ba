from . import raycast, depth, normals3d
