"""Layered engine configuration (Config singleton + option-set analog).

The reference has two tiers: a global JSON-backed Config singleton with env
overrides (modules/io/config.h:19-25, etc/products/*.json) and ~100 engine
knobs in assemble_options (modules/variants/assemble.h:475).  Here:

  defaults (dataclass field defaults)
    < product file (BGT_CONFIG=path.json, flat key->value)
    < environment  (BGT_OPT_<FIELD>=value)
    < CLI          (--opt field=value, repeatable)

`apply_options(opt_obj, overrides)` resolves that layering onto any options
dataclass (DiscoverOptions, SvOptions, ...) with type coercion from the
field's default, so every engine knob is reachable from the command line
without a bespoke flag."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List


def _coerce(value: str, like):
    if isinstance(like, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(like, int):
        return int(value)
    if isinstance(like, float):
        return float(value)
    if isinstance(like, tuple):  # e.g. trace_offsets=1234,5678
        return tuple(int(x) for x in value.split(",") if x.strip())
    return value


def load_product_config() -> Dict[str, str]:
    """Flat key->value map from BGT_CONFIG (etc/products analog)."""
    path = os.environ.get("BGT_CONFIG")
    if not path or not os.path.isfile(path):
        return {}
    with open(path) as f:
        data = json.load(f)
    return {str(k): str(v) for k, v in data.items()}


def apply_options(opt, cli_overrides: List[str] | None = None):
    """Resolve layered overrides onto an options dataclass, in place.

    cli_overrides: ["field=value", ...].  Unknown fields raise (typos must
    not silently no-op).  Returns the dict of applied (field, value)."""
    fields = {f.name: f for f in dataclasses.fields(opt)}
    applied = {}

    def set_one(name: str, raw: str, source: str):
        if name not in fields:
            raise ValueError(
                f"unknown option {name!r} for {type(opt).__name__} "
                f"(have: {', '.join(sorted(fields))})"
            )
        cur = getattr(opt, name)
        val = _coerce(raw, cur)
        setattr(opt, name, val)
        applied[name] = (val, source)

    for k, v in load_product_config().items():
        if k in fields:
            set_one(k, v, "product")
    prefix = "BGT_OPT_"
    for k, v in os.environ.items():
        if k.startswith(prefix):
            name = k[len(prefix) :].lower()
            if name in fields:
                set_one(name, v, "env")
    for item in cli_overrides or []:
        if "=" not in item:
            raise ValueError(f"--opt needs field=value, got {item!r}")
        name, raw = item.split("=", 1)
        set_one(name.strip(), raw, "cli")
    return applied
