"""Packaging surface: the reference is pip-installable (reference
setup.py:1-30); the rebuild ships a pyproject.toml with a console entry
point (`cookietts-tpu`) fronting the same CLI as `python -m cookietts_tpu`.
"""
import importlib
import os
import subprocess
import sys

import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_parses_and_entry_point_resolves():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["name"] == "cookietts-tpu"
    ep = meta["project"]["scripts"]["cookietts-tpu"]
    mod_name, fn_name = ep.split(":")
    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, fn_name))


def test_module_entry_smoke():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", "cookietts_tpu", "--help"],
                       capture_output=True, text=True, env=env, cwd=REPO,
                       timeout=300)
    assert r.returncode == 0
    assert "train" in r.stdout and "server" in r.stdout
