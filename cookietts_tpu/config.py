"""Typed hyper-parameter configuration with CLI override grammar.

Capability-parity rebuild of the reference's three config tiers
(reference: CookieTTS/utils/utils_hparam.py, the per-vocoder JSON configs,
and the live ``run_every_epoch.py`` overlay — see SURVEY.md §5):

1. :class:`HParams` — typed named params with ``parse("a=1,b=[2,3]")``
   string-override grammar and JSON (de)serialization.
2. :func:`load_json_config` — raw JSON config files.
3. Live overlay — see :mod:`cookietts_tpu.runtime.live_config`.

This is a fresh implementation; only the user-facing grammar matches the
reference (``utils_hparam.py:32-40`` documents the grammar it accepts).
"""
from __future__ import annotations

import json
import re
from typing import Any, Dict

# One assignment inside a comma-separated override string. Values may be
# scalars, quoted strings, or bracketed lists (lists may contain commas,
# which is why a plain str.split(',') is not enough).
_ASSIGN_RE = re.compile(
    r"""
    \s*(?P<name>[a-zA-Z][\w\.]*)\s*=\s*
    (?P<value>
        \[[^\]]*\]            # [list, of, things]
      | "(?:[^"\\]|\\.)*"     # "quoted string"
      | '(?:[^'\\]|\\.)*'     # 'quoted string'
      | [^,\[]*               # bare scalar
    )\s*
    ($|,)
    """,
    re.VERBOSE,
)


def _parse_scalar(text: str) -> Any:
    t = text.strip()
    if t == "":
        return ""
    low = t.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("none", "null"):
        return None
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        pass
    if (t[0] == t[-1] == '"') or (t[0] == t[-1] == "'"):
        return t[1:-1]
    return t


def parse_override_string(s: str) -> Dict[str, Any]:
    """Parse ``"a=1,b=[2,3],c=hello,d=3.5e-4"`` into a dict."""
    out: Dict[str, Any] = {}
    pos = 0
    while pos < len(s):
        m = _ASSIGN_RE.match(s, pos)
        if not m:
            raise ValueError(f"Could not parse hparam override at: {s[pos:]!r}")
        name, raw = m.group("name"), m.group("value").strip()
        if raw.startswith("["):
            inner = raw[1:-1].strip()
            out[name] = [] if not inner else [_parse_scalar(v) for v in inner.split(",")]
        else:
            out[name] = _parse_scalar(raw)
        pos = m.end()
    return out


class HParams:
    """A typed, dot-accessible hyper-parameter container.

    - ``HParams(a=1, b=[2,3])`` declares params with types inferred from
      the defaults.
    - ``hp.parse("a=4,b=[9]")`` applies a CLI override string; overriding
      an undeclared name or changing a param's type raises.
    - ``hp.to_json()`` / ``HParams.from_json(s)`` round-trip via JSON.
    """

    def __init__(self, **kwargs: Any):
        object.__setattr__(self, "_params", {})
        for k, v in kwargs.items():
            self.add_hparam(k, v)

    # -- declaration ------------------------------------------------------
    def add_hparam(self, name: str, value: Any) -> None:
        if name in self._params:
            raise ValueError(f"Hyperparameter {name!r} already declared")
        self._params[name] = value

    def del_hparam(self, name: str) -> None:
        self._params.pop(name, None)

    # -- access -----------------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        params = object.__getattribute__(self, "_params")
        if name in params:
            return params[name]
        raise AttributeError(f"HParams has no parameter {name!r}")

    def __setattr__(self, name: str, value: Any) -> None:
        if name in self._params:
            self.set_hparam(name, value)
        else:
            self.add_hparam(name, value)

    def __contains__(self, name: str) -> bool:
        return name in self._params

    def get(self, name: str, default: Any = None) -> Any:
        return self._params.get(name, default)

    def keys(self):
        return self._params.keys()

    def values(self) -> Dict[str, Any]:
        return dict(self._params)

    # -- mutation ---------------------------------------------------------
    def set_hparam(self, name: str, value: Any) -> None:
        if name not in self._params:
            raise KeyError(f"Unknown hyperparameter {name!r}")
        old = self._params[name]
        self._params[name] = _coerce(name, value, old)

    def parse(self, override_string: str) -> "HParams":
        if override_string:
            for k, v in parse_override_string(override_string).items():
                self.set_hparam(k, v)
        return self

    def override_from_dict(self, d: Dict[str, Any]) -> "HParams":
        for k, v in d.items():
            self.set_hparam(k, v)
        return self

    # -- serialization ------------------------------------------------------
    def to_json(self, indent: int | None = None) -> str:
        return json.dumps(self._params, indent=indent, default=str)

    @classmethod
    def from_json(cls, s: str) -> "HParams":
        return cls(**json.loads(s))

    def copy(self) -> "HParams":
        return HParams(**{k: (list(v) if isinstance(v, list) else v) for k, v in self._params.items()})

    def __repr__(self) -> str:
        items = ", ".join(f"{k}={v!r}" for k, v in sorted(self._params.items()))
        return f"HParams({items})"


def _coerce(name: str, value: Any, old: Any) -> Any:
    """Type-check an override against the declared default's type."""
    if old is None or value is None:
        return value
    if isinstance(old, bool):
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            return value.lower() == "true"
        raise TypeError(f"{name}: expected bool, got {value!r}")
    if isinstance(old, float) and isinstance(value, (int, float)):
        return float(value)
    if isinstance(old, int) and isinstance(value, int):
        return value
    if isinstance(old, int) and isinstance(value, float) and value.is_integer():
        return int(value)
    if isinstance(old, str):
        return str(value)
    if isinstance(old, (list, tuple)):
        if isinstance(value, (list, tuple)):
            return list(value)
        return [value]
    if type(old) is type(value):
        return value
    raise TypeError(f"{name}: expected {type(old).__name__}, got {type(value).__name__} ({value!r})")


def load_json_config(path: str) -> Dict[str, Any]:
    """Load a raw JSON config file (vocoder/preprocess/server config tier)."""
    with open(path) as f:
        # tolerate // comments like the reference's JSON configs
        text = re.sub(r"^\s*//.*$", "", f.read(), flags=re.MULTILINE)
    return json.loads(text)
