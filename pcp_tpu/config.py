"""Config system: YAML-driven experiment configuration.

API-compatible with the reference pcdet config layer (/root/reference/pcdet/config.py):
  * a global ``cfg`` namespace object,
  * ``cfg_from_yaml_file(path, cfg)`` with recursive ``_BASE_CONFIG_`` inheritance,
  * ``cfg_from_list(['KEY.SUBKEY', 'value', ...], cfg)`` dotted CLI overrides with
    literal-eval type preservation,
  * ``log_config_to_file``.

The reference uses EasyDict; we ship our own attribute-dict (``CfgDict``) so the
framework has zero non-baked-in dependencies.
"""
from pathlib import Path
import ast
import copy

import yaml


class CfgDict(dict):
    """A dict whose items are also accessible as attributes, recursively."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d, **kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, CfgDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._wrap(value))

    def __deepcopy__(self, memo):
        return CfgDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def clone(self):
        return copy.deepcopy(self)


def log_config_to_file(cfg_, pre="cfg", logger=None):
    for key, val in cfg_.items():
        if isinstance(val, CfgDict):
            if logger is not None:
                logger.info("----------- %s.%s -----------" % (pre, key))
            log_config_to_file(val, pre=pre + "." + key, logger=logger)
            continue
        if logger is not None:
            logger.info("%s.%s: %s" % (pre, key, val))


def merge_new_config(config, new_config):
    """Recursively merge ``new_config`` into ``config``; handles _BASE_CONFIG_
    includes the same way as the reference (include is loaded first, then
    overridden by sibling keys)."""
    if "_BASE_CONFIG_" in new_config:
        with open(new_config["_BASE_CONFIG_"], "r") as f:
            base = yaml.safe_load(f)
        config.update(CfgDict(base))

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if isinstance(val, dict):
            if key not in config or not isinstance(config.get(key), dict):
                config[key] = CfgDict()
            merge_new_config(config[key], val)
        else:
            config[key] = val
    return config


def cfg_from_yaml_file(cfg_file, config):
    cfg_file = Path(cfg_file)
    with open(cfg_file, "r") as f:
        new_config = yaml.safe_load(f)

    # Resolve _BASE_CONFIG_ relative paths against repo root (the reference
    # resolves against CWD=tools/; we accept both).
    if isinstance(new_config, dict) and "_BASE_CONFIG_" in new_config:
        new_config["_BASE_CONFIG_"] = _resolve_base(new_config["_BASE_CONFIG_"], cfg_file)
    _resolve_nested_bases(new_config, cfg_file)

    merge_new_config(config=config, new_config=new_config)
    return config


def _resolve_base(base, cfg_file):
    p = Path(base)
    if p.exists():
        return str(p)
    # try relative to the including file's directory and repo root
    here = Path(cfg_file).resolve().parent
    for root in [here, here.parent, here.parent.parent, Path(__file__).resolve().parent.parent]:
        cand = (root / base).resolve()
        if cand.exists():
            return str(cand)
        # the reference writes paths like ../tools/cfgs/... relative to tools/
        cand = (root / str(base).lstrip("./")).resolve()
        if cand.exists():
            return str(cand)
    # strip leading ../ components and retry against repo root
    stripped = str(base)
    while stripped.startswith("../"):
        stripped = stripped[3:]
    cand = Path(__file__).resolve().parent.parent / stripped
    if cand.exists():
        return str(cand)
    return str(base)


def _resolve_nested_bases(node, cfg_file):
    if isinstance(node, dict):
        for k, v in node.items():
            if k == "_BASE_CONFIG_":
                node[k] = _resolve_base(v, cfg_file)
            else:
                _resolve_nested_bases(v, cfg_file)
    elif isinstance(node, list):
        for v in node:
            _resolve_nested_bases(v, cfg_file)


def cfg_from_list(cfg_list, config):
    """Set config keys via list, e.g. ['MODEL.VFE.NUM_FILTERS', '[64]']."""
    assert len(cfg_list) % 2 == 0
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = full_key.split(".")
        d = config
        for subkey in key_list[:-1]:
            assert subkey in d, "NotFoundKey: %s" % subkey
            d = d[subkey]
        subkey = key_list[-1]
        try:
            value = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            value = v
        if subkey not in d:
            # unlike the reference's hard assert, permit introducing new keys
            # (datasets read config via .get(KEY, default) everywhere)
            d[subkey] = value
            continue
        if isinstance(value, dict):
            # partial dict override: merge instead of replace
            for sk, sv in value.items():
                d[subkey][sk] = sv
        else:
            assert type(value) == type(d[subkey]) or d[subkey] is None or value is None, (
                "type mismatch for %s: %s vs %s" % (full_key, type(value), type(d[subkey]))
            )
            d[subkey] = value
    return config


ROOT_DIR = Path(__file__).resolve().parent.parent

cfg = CfgDict()
cfg.ROOT_DIR = ROOT_DIR
cfg.LOCAL_RANK = 0
