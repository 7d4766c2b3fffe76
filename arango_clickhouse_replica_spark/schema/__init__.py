from .dsl import (
    CompiledMapping,
    TableMapping,
    TransformResult,
    apply_mapping,
    compile_mapping,
    default_cast_registry,
)

__all__ = [
    "CompiledMapping",
    "TableMapping",
    "TransformResult",
    "apply_mapping",
    "compile_mapping",
    "default_cast_registry",
]
