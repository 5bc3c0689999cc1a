from .compiler import MappingCompiler  # noqa: F401
