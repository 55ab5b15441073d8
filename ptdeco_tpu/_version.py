__version__ = "0.2.0"

_parts = __version__.split(".")
__version_info__ = int(_parts[0]), int(_parts[1]), int(_parts[2])
