from . import chunked, metrics, whole_scene
