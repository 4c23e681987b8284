"""Console entry point (reference main.py console script surface)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pmarlo_tpu.main import get_info, get_version, main


def test_get_version_and_info():
    v = get_version()
    assert isinstance(v, str) and v
    info = get_info()
    assert "version" in info


def test_cli_info(capsys):
    rc = main(["info"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "version" in out or "backend" in out


def test_cli_no_command_defaults_to_info(capsys):
    assert main([]) == 0


@pytest.mark.slow
def test_cli_run_segment(tmp_path, capsys):
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.io.pdb import write_pdb

    s = alanine_dipeptide_structure()
    pdb = tmp_path / "ala.pdb"
    write_pdb(
        pdb, s.coordinates(),
        [a.name for r in s.residues for a in r.atoms],
        [a.resname for r in s.residues for a in r.atoms],
        [a.resid for r in s.residues for a in r.atoms],
    )
    out = tmp_path / "seg.npz"
    rc = main([
        "run-segment", str(pdb), "--steps", "200",
        "--report-interval", "100", "--output", str(out),
    ])
    assert rc == 0
    assert out.exists()
    with np.load(out) as z:
        assert z["coordinates"].shape[0] == 2


def test_cli_bad_command_exits():
    with pytest.raises(SystemExit):
        main(["definitely-not-a-command"])
