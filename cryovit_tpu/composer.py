"""Minimal YAML config composition engine (hydra-compatible subset).

The reference drives everything through Hydra 1.3 (structured configs +
YAML group composition + ``_target_`` instantiation + MULTIRUN sweeps,
reference ``config.py:192-200`` and ``configs/**``). Hydra is not available
in this environment, so this module implements the subset the framework
needs, preserving the public config surface (group/option names, ``defaults``
lists, ``${...}`` interpolation, ``group=option`` overrides, sweeps):

- ``compose(name, overrides)``     — build a config from the YAML tree
- ``instantiate(node)``            — construct objects from ``_target_``
- ``expand_sweep(cfg)``            — expand ``sweep.params`` grids
- ``DotDict``                      — attribute-access nested dict

Supported defaults-list entry forms::

    - _self_                  # position of the file's own body
    - some_schema             # registered structured-config schema
    - sibling_file            # another option in the same group dir
    - optional sibling        # ignored if absent
    - group: option           # compose configs/<group>/<option>.yaml
    - group: [opt1, opt2]     # merge several options of a group
    - override /group: option # (experiments) replace a root group choice

Interpolations: ``${a.b.c}`` (root-relative), ``${choices.<group>}`` (the
selected option of a group — hydra's ``${hydra:runtime.choices.*}``), and
``${env:VAR,default}``. ``???`` marks required values (checked by
validators).
"""

from __future__ import annotations

import copy
import dataclasses
import importlib
import itertools
import os
import re
from functools import partial
from pathlib import Path
from typing import Any

import yaml

__all__ = [
    "MISSING",
    "ConfigError",
    "DotDict",
    "compose",
    "instantiate",
    "expand_sweep",
    "register_schema",
    "missing_keys",
    "to_plain",
]

MISSING = "???"

_DEFAULT_CONFIG_DIR = Path(__file__).parent / "configs"

# Registered structured-config schemas: name -> plain dict of defaults.
_SCHEMA_REGISTRY: dict[str, dict] = {}


class ConfigError(Exception):
    """Raised on malformed configs, bad overrides, or missing files."""


class DotDict(dict):
    """A dict with attribute access, returning nested DotDicts."""

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        del self[key]

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return DotDict({k: DotDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [DotDict.wrap(v) for v in obj]
        return obj


def to_plain(obj: Any) -> Any:
    """Recursively convert DotDicts back to plain dicts (for YAML dumps)."""
    if isinstance(obj, dict):
        return {k: to_plain(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [to_plain(v) for v in obj]
    return obj


def register_schema(name: str, schema: Any) -> None:
    """Register a structured-config schema (dataclass instance or dict)."""
    if dataclasses.is_dataclass(schema) and not isinstance(schema, type):
        schema = dataclasses.asdict(schema)
    elif dataclasses.is_dataclass(schema):
        schema = dataclasses.asdict(schema())
    _SCHEMA_REGISTRY[name] = _normalize(schema)


def _normalize(obj: Any) -> Any:
    """Make schema values YAML-plain (Paths → str, Enums → value)."""
    if isinstance(obj, dict):
        return {k: _normalize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_normalize(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    if hasattr(obj, "value") and obj.__class__.__module__ != "builtins":
        return obj.value
    return obj


def _deep_merge(base: dict, new: dict) -> dict:
    """Merge ``new`` into ``base`` (new wins; dicts merge, lists replace).

    OmegaConf parity: a ``???`` (MISSING) value never overwrites an existing
    value — schemas appearing late in a defaults list only fill gaps.
    """
    for key, val in new.items():
        if key in base and isinstance(base[key], dict) and isinstance(val, dict):
            _deep_merge(base[key], val)
        elif val == MISSING and key in base:
            continue
        else:
            base[key] = copy.deepcopy(val)
    return base


def _set_path(cfg: dict, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        nxt = node.get(p)
        if not isinstance(nxt, dict):
            nxt = DotDict()
            node[p] = nxt
        node = nxt
    node[parts[-1]] = value


def _get_path(cfg: dict, dotted: str) -> Any:
    node: Any = cfg
    for p in dotted.split("."):
        if not isinstance(node, dict) or p not in node:
            raise KeyError(dotted)
        node = node[p]
    return node


class _Loader(yaml.SafeLoader):
    """SafeLoader with YAML 1.2 float semantics (``1e-4`` parses as float)."""


_Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def _yaml_load(text: str) -> Any:
    return yaml.load(text, Loader=_Loader)


def _parse_value(text: str) -> Any:
    """Parse an override value with YAML scalar rules."""
    if text.startswith("[") or text.startswith("{"):
        return _yaml_load(text)
    if "," in text:
        return [_yaml_load(v.strip()) for v in text.split(",")]
    return _yaml_load(text)


def _is_global_package(path: Path) -> bool:
    """True if the file opens with a ``# @package _global_`` directive."""
    with open(path) as f:
        for line in f:
            stripped = line.strip()
            if not stripped:
                continue
            return stripped.startswith("#") and "@package _global_" in stripped
    return False


def _load_yaml(path: Path) -> dict:
    if not path.exists():
        raise ConfigError(f"config file not found: {path}")
    with open(path) as f:
        data = _yaml_load(f.read())
    return data or {}


@dataclasses.dataclass
class _Composer:
    config_dir: Path
    choices: dict[str, str] = dataclasses.field(default_factory=dict)

    # ---- defaults-list processing -------------------------------------

    def compose_file(self, rel: str, group: str = "") -> dict:
        """Compose one YAML file (resolving its own defaults list)."""
        path = self.config_dir / f"{rel}.yaml"
        body = _load_yaml(path)
        defaults = body.pop("defaults", None)
        if defaults is None:
            return body

        cfg: dict = {}
        self_merged = False
        for entry in defaults:
            if entry == "_self_":
                _deep_merge(cfg, body)
                self_merged = True
            elif isinstance(entry, str):
                self._merge_named(cfg, entry, group)
            elif isinstance(entry, dict):
                for key, option in entry.items():
                    self._merge_group_entry(cfg, key, option, group)
            else:
                raise ConfigError(f"bad defaults entry in {path}: {entry!r}")
        if not self_merged:
            _deep_merge(cfg, body)
        return cfg

    def _merge_named(self, cfg: dict, entry: str, group: str) -> None:
        optional = entry.startswith("optional ")
        name = entry.removeprefix("optional ")
        # allow interpolated names like `optional trainer_model: ${model}`
        if name in _SCHEMA_REGISTRY:
            _deep_merge(cfg, copy.deepcopy(_SCHEMA_REGISTRY[name]))
            return
        rel = f"{group}/{name}" if group else name
        if not (self.config_dir / f"{rel}.yaml").exists():
            if optional:
                return
            raise ConfigError(f"defaults entry '{entry}' not found (in group '{group}')")
        _deep_merge(cfg, self.compose_file(rel, group))

    def _merge_group_entry(self, cfg: dict, key: str, option: Any, group: str) -> None:
        if key.startswith("override "):
            # experiment-style root group override: `override /model: cryovit`
            target = key.removeprefix("override ").lstrip("/")
            if target.startswith("hydra"):
                return
            self.choices.setdefault(target, option)
            return
        optional = key.startswith("optional ")
        key = key.removeprefix("optional ")
        if key.startswith("hydra"):
            return
        subgroup = f"{group}/{key}" if group else key
        # an explicit user choice for this group wins over the file default
        option = self.choices.get(subgroup, option)
        if option is None:
            return
        if option == MISSING:
            raise ConfigError(
                f"config group '{subgroup}' is required: pass '{subgroup}=<option>'"
            )
        if isinstance(option, str) and option.startswith("${"):
            # deferred choice like `optional trainer_model: ${model}`
            ref = option[2:-1]
            option = self.choices.get(ref)
            if option is None:
                return
            optional = True
        options = option if isinstance(option, list) else [option]
        merged_any = False
        for opt in options:
            rel = f"{subgroup}/{opt}"
            path = self.config_dir / f"{rel}.yaml"
            if not path.exists():
                if optional:
                    continue
                raise ConfigError(f"config group '{subgroup}' has no option '{opt}'")
            sub = self.compose_file(rel, subgroup)
            merged_any = True
            if subgroup.endswith("experiments") or _is_global_package(path):
                _deep_merge(cfg, sub)  # @package _global_
            else:
                node = cfg
                for part in key.split("/"):
                    node = node.setdefault(part, {})
                _deep_merge(node, sub)
        if merged_any and not isinstance(option, list):
            self.choices.setdefault(subgroup, str(option))


# ---- interpolation ------------------------------------------------------

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


def _resolve_interp(root: dict, choices: dict, text: str, seen: tuple = ()) -> Any:
    def lookup(expr: str) -> Any:
        expr = expr.strip()
        if expr in seen:
            raise ConfigError(f"interpolation cycle at ${{{expr}}}")
        if expr.startswith("env:"):
            spec = expr[4:]
            var, _, default = spec.partition(",")
            return os.environ.get(var.strip(), default.strip() or None)
        if expr.startswith("choices.") or expr.startswith("hydra:runtime.choices."):
            grp = expr.split("choices.", 1)[1]
            return choices.get(grp, "any")
        try:
            val = _get_path(root, expr)
        except KeyError:
            raise ConfigError(f"interpolation key not found: ${{{expr}}}") from None
        if isinstance(val, str) and _INTERP_RE.search(val):
            return _resolve_interp(root, choices, val, seen + (expr,))
        return val

    full = _INTERP_RE.fullmatch(text)
    if full:
        return lookup(full.group(1))
    return _INTERP_RE.sub(lambda m: str(lookup(m.group(1))), text)


def _resolve_all(root: dict, choices: dict, node: Any) -> Any:
    if isinstance(node, dict):
        return DotDict({k: _resolve_all(root, choices, v) for k, v in node.items()})
    if isinstance(node, list):
        return [_resolve_all(root, choices, v) for v in node]
    if isinstance(node, str) and "${" in node:
        return _resolve_all(root, choices, _resolve_interp(root, choices, node))
    return node


# ---- public API ----------------------------------------------------------

def compose(
    config_name: str,
    overrides: list[str] | None = None,
    config_dir: str | Path | None = None,
    resolve: bool = True,
) -> DotDict:
    """Compose a root config with hydra-style overrides.

    Override forms: ``group=option`` (group choice), ``+experiments=name``
    (merge an experiment at root), ``key.path=value`` (leaf set).
    """
    config_dir = Path(config_dir) if config_dir else _DEFAULT_CONFIG_DIR
    overrides = list(overrides or [])

    group_choices: dict[str, str] = {}
    experiment: str | None = None
    leaf_overrides: list[tuple[str, Any]] = []
    for ov in overrides:
        add = ov.startswith("+")
        key, sep, value = ov.lstrip("+").partition("=")
        if not sep:
            raise ConfigError(f"bad override (expected key=value): {ov!r}")
        if key == "experiments" or key == "experiment":
            experiment = value
        elif (
            not add
            and "." not in key
            and (config_dir / key).is_dir()
            and (config_dir / key / f"{value}.yaml").exists()
        ):
            group_choices[key] = value
        elif not add and "." in key and (config_dir / key.replace(".", "/") / f"{value}.yaml").exists():
            group_choices[key.replace(".", "/")] = value
        else:
            leaf_overrides.append((key, _parse_value(value)))

    # Experiment files may pin group choices via `override /group:`; peek at
    # them before composing so defaults resolve with the right options.
    composer = _Composer(config_dir=config_dir, choices=dict(group_choices))
    exp_body: dict | None = None
    if experiment is not None:
        exp_body = _load_yaml(config_dir / "experiments" / f"{experiment}.yaml")
        for entry in exp_body.get("defaults", []) or []:
            if isinstance(entry, dict):
                for key, option in entry.items():
                    if key.startswith("override "):
                        target = key.removeprefix("override ").lstrip("/")
                        if not target.startswith("hydra"):
                            composer.choices.setdefault(target, option)

    cfg = composer.compose_file(config_name)

    if exp_body is not None:
        body = {k: v for k, v in exp_body.items() if k not in ("defaults", "hydra")}
        _deep_merge(cfg, body)

    for key, value in leaf_overrides:
        _set_path(cfg, key, value)

    cfg = DotDict.wrap(cfg)
    if resolve:
        cfg = _resolve_all(cfg, composer.choices, cfg)
    cfg["_choices_"] = DotDict(composer.choices)
    return cfg


def missing_keys(cfg: dict, prefix: str = "") -> list[str]:
    """List dotted paths whose value is the ``???`` MISSING sentinel."""
    out: list[str] = []
    for key, val in cfg.items():
        if key == "_choices_":
            continue
        path = f"{prefix}{key}"
        if isinstance(val, dict):
            out.extend(missing_keys(val, prefix=f"{path}."))
        elif val == MISSING:
            out.append(path)
    return out


def _import_target(target: str) -> Any:
    module_name, _, attr = target.rpartition(".")
    if not module_name:
        raise ConfigError(f"bad _target_: {target!r}")
    module = importlib.import_module(module_name)
    try:
        return getattr(module, attr)
    except AttributeError as e:
        raise ConfigError(f"no attribute {attr!r} in {module_name}") from e


def instantiate(node: Any, **kwargs: Any) -> Any:
    """Recursively construct objects from ``_target_`` nodes.

    ``_partial_: true`` returns ``functools.partial``. Non-target dicts are
    returned as DotDicts with children instantiated.
    """
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    if not isinstance(node, dict):
        return node
    children = {
        k: instantiate(v)
        for k, v in node.items()
        if k not in ("_target_", "_partial_", "_choices_")
    }
    if "_target_" not in node:
        return DotDict(children)
    fn = _import_target(node["_target_"])
    children.update(kwargs)
    if node.get("_partial_", False):
        return partial(fn, **children)
    return fn(**children)


def expand_sweep_file(
    experiment: str, config_dir: str | Path | None = None
) -> list[list[str]]:
    """Expand the sweep grid of an experiment YAML without composing the
    full config (sweep params may themselves fill required config groups,
    e.g. ``test_experiment`` sweeps ``datamodule``)."""
    config_dir = Path(config_dir) if config_dir else _DEFAULT_CONFIG_DIR
    body = _load_yaml(config_dir / "experiments" / f"{experiment}.yaml")
    return expand_sweep(body)


def expand_sweep(cfg: dict) -> list[list[str]]:
    """Expand a ``sweep.params`` grid into a list of override lists.

    The reference expresses sweeps via hydra MULTIRUN
    (``configs/experiments/*.yaml``); this framework keeps the same grids
    under a ``sweep: params:`` key. Values may be lists or comma-strings.
    """
    sweep = cfg.get("sweep") or {}
    params: dict[str, Any] = sweep.get("params") or {}
    if not params:
        return [[]]
    keys, value_lists = [], []
    for key, vals in params.items():
        if isinstance(vals, str):
            vals = [v.strip() for v in vals.split(",")]
        elif not isinstance(vals, list):
            vals = [vals]
        keys.append(key)
        value_lists.append(vals)
    return [
        [f"{k}={v}" for k, v in zip(keys, combo)]
        for combo in itertools.product(*value_lists)
    ]
