"""Config default parity audit against the reference's yacs tree.

Regex-parses every ``_C[.scope].key = value`` default from the reference's
lib/common/config.py and asserts that each option our tree carries has the
SAME default (lists compare as tuples). Options the rebuild intentionally
does not carry (legacy/unused in the reference's own code paths: gpus,
test_uv, color nets, ...) are simply absent from our tree and skipped."""

import ast
import os.path as osp
import re

import pytest

REF = "/root/reference/lib/common/config.py"


def _parse_reference_defaults():
    out = {}
    if not osp.exists(REF):
        pytest.skip("reference tree not mounted")
    pat = re.compile(r"^_C(\.(?:net|dataset))?\.(\w+)\s*=\s*(.+?)\s*$")
    for line in open(REF):
        m = pat.match(line)
        if not m:
            continue
        scope = (m.group(1) or ".").lstrip(".")
        try:
            val = ast.literal_eval(m.group(3))
        except (ValueError, SyntaxError):
            continue                      # CN() nodes etc.
        out[(scope or "top", m.group(2))] = val
    return out


def _norm(v):
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, float) and float(v).is_integer():
        return v
    return v


def test_defaults_match_reference():
    from icon_tpu.config import Config
    ref = _parse_reference_defaults()
    assert len(ref) > 40                  # the parse actually found the tree

    cfg = Config()
    ours = {("top", k): v for k, v in vars(cfg).items()
            if not hasattr(v, "__dataclass_fields__")}
    ours.update({("net", k): v for k, v in vars(cfg.net).items()})
    ours.update({("dataset", k): v for k, v in vars(cfg.dataset).items()})

    mismatches = []
    checked = 0
    for key, ref_val in ref.items():
        if key not in ours:
            continue                      # intentionally not carried
        checked += 1
        if _norm(ours[key]) != _norm(ref_val):
            mismatches.append((key, ours[key], ref_val))
    assert checked > 30, f"only {checked} shared options found"
    assert not mismatches, mismatches
