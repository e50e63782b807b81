"""Name-level parity with the reference: every public symbol of each
reference module must exist in the corresponding paule_tpu namespace(s).
Guards against regressions of the compatibility surface (docs/parity.md)."""

import ast
import os

import pytest

from paule_tpu.reference_bridge import reference_available

REFERENCE = "/root/reference/paule"

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def public_names(path):
    tree = ast.parse(open(path).read())
    out = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) \
                and not node.name.startswith("_"):
            out.append(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and not t.id.startswith("_"):
                    out.append(t.id)
    return out


def missing(ref_module, *namespaces):
    names = public_names(os.path.join(REFERENCE, ref_module))
    return [n for n in names
            if not any(hasattr(ns, n) for ns in namespaces)]


def test_util_surface():
    from paule_tpu import util

    assert missing("util.py", util) == []


def test_models_surface():
    from paule_tpu import models

    assert missing("models.py", models) == []


def test_paule_surface():
    from paule_tpu import api, util
    from paule_tpu.planning import engine, results

    assert missing("paule.py", api, results, engine, util) == []


def test_visualize_surface():
    from paule_tpu import visualize

    assert missing("visualize.py", visualize) == []


def test_init_surface():
    import paule_tpu

    assert missing("__init__.py", paule_tpu) == []
