# Public-surface stub for the row-backend compiler — the analog of the
# reference distribution's src/validr/validator.pyi (guyskk/validr);
# error types live in errors.py here and are re-exported by the package
# root.
from typing import Any, Callable, Dict, List

from .schema import Builder, Schema

class Compiler:
    validators: Dict[str, Callable[..., Any]]
    is_dump: bool
    def __init__(self, validators: Dict[str, Callable[..., Any]] | None = None,
                 is_dump: bool = False) -> None: ...
    def compile(self, schema: Schema | Builder) -> Callable[[Any], Any]: ...

def validator(string: bool | None = None, *,
              accept: Any = None, output: Any = None) -> Callable[..., Any]: ...

builtin_validators: Dict[str, Callable[..., Any]]

def create_enum_validator(name: str, items: List[Any],
                          string: bool = True) -> Callable[..., Any]: ...
def create_re_validator(name: str, pattern: str,
                        default_maxlen: int = 255) -> Callable[..., Any]: ...
