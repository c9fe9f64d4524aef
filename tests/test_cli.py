"""CLI entry point (``python -m stark_tpu``), in-process.

Covers reference parity for the demo (src/main.rs:8-14 constructs the
field, an 8th primitive root, an empty polynomial, and prints them) and
the prove/verify/inspect pipeline the reference never wired up.  Uses
the T=64/blowup=4/queries=4 config shared with test_golden/test_models
so the compiled graphs are reused.
"""

import pytest

from stark_tpu.__main__ import main


def test_demo_reference_parity(capsys):
    # main.rs:8-14: P = 998244353, 8th primitive root via g=3
    # (ff.rs:215-223: g^((p-1)/8)), empty polynomial.
    assert main(["demo"]) == 0
    out = capsys.readouterr().out
    assert "p = 998244353" in out
    root = pow(3, (998244353 - 1) // 8, 998244353)
    assert f"8th primitive root of unity: {root}" in out
    assert "empty polynomial" in out


def test_prove_verify_inspect_roundtrip(tmp_path, capsys):
    proof_file = str(tmp_path / "proof.bin")
    args = ["--trace-length", "64", "--blowup", "4", "--queries", "4"]
    assert main(["prove", *args, "--out", proof_file]) == 0
    assert main(["verify", proof_file, *args]) == 0
    out = capsys.readouterr().out
    assert "ACCEPT" in out

    assert main(["inspect", proof_file]) == 0
    out = capsys.readouterr().out
    assert "MerkleRoot" in out and "MerklePath" in out

    # Tampered bytes must REJECT (exit code 1).
    data = bytearray(open(proof_file, "rb").read())
    data[len(data) // 2] ^= 1
    bad = str(tmp_path / "bad.bin")
    open(bad, "wb").write(bytes(data))
    assert main(["verify", bad, *args]) == 1
    assert "REJECT" in capsys.readouterr().out


def test_unknown_command_rejected():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_cli_model_selection(tmp_path, capsys):
    """--model reaches every registry entry; cube needs blowup 8 (loud
    exit 2 below it)."""
    proof_file = str(tmp_path / "p.bin")
    base = ["--trace-length", "64", "--queries", "4", "--out", proof_file]
    assert main(["prove", "--model", "fib2", *base]) == 0
    assert (
        main(
            ["verify", proof_file, "--model", "fib2", "--trace-length",
             "64", "--queries", "4"]
        )
        == 0
    )
    # wrong model for the proof: must reject, not accept
    assert (
        main(
            ["verify", proof_file, "--model", "square", "--trace-length",
             "64", "--queries", "4"]
        )
        == 1
    )
    # cube below its minimum blowup: loud usage error
    assert main(["prove", "--model", "cube", *base, "--blowup", "4"]) == 2
    capsys.readouterr()
