# Public-surface stub for the model layer.  The reference distribution
# also ships a model stub (guyskk/validr src/validr/model.pyi); the
# CONTRACT matches it — @modelclass usable bare or with options, the
# fields()/asdict() helpers — but the declarations here are written in
# this package's stub style (PEP 604 unions, keyword-only options
# spelled out) against the implementation in model.py.
from typing import Any, Callable, Dict, Iterable, Set, Type, TypeVar, overload

from .pyvalidate import Compiler

class ImmutableInstanceError(AttributeError): ...

_M = TypeVar("_M")

@overload
def modelclass(cls: Type[_M], *,
               compiler: Compiler | None = None,
               immutable: bool = False) -> Type[_M]: ...
@overload
def modelclass(cls: None = None, *,
               compiler: Compiler | None = None,
               immutable: bool = False
               ) -> Callable[[Type[_M]], Type[_M]]: ...
def fields(m: Any) -> Set[str]: ...
def asdict(m: Any, *,
           keys: Iterable[str] | None = None) -> Dict[str, Any]: ...
