from .obj import load_obj, load_mtl, LoadedModel, SubmeshData  # noqa: F401
from .image import write_png, tonemap_reinhard  # noqa: F401
