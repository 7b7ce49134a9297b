"""The public namespace must stay a drop-in superset of the reference's.

The inventory below is the union of every ``__all__`` in the reference
package (202 names).  All 202 are present — including ``derivative_torch``,
which lazily imports torch only when called (torch-next-to-jax is unsafe in
one process; see ``tests/test_torch_parity.py``).
"""
import ast
import os

import pytest

import mimikit_tpu as mmk

DOCUMENTED_ABSENCES = set()

REFERENCE_PKG = "/root/reference/mimikit"


def _reference_inventory():
    names = set()
    for dirpath, _, files in os.walk(REFERENCE_PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            try:
                tree = ast.parse(open(os.path.join(dirpath, fname)).read())
            except SyntaxError:
                continue
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Assign)
                    and len(node.targets) == 1
                    and isinstance(node.targets[0], ast.Name)
                    and node.targets[0].id == "__all__"
                ):
                    try:
                        names.update(ast.literal_eval(node.value))
                    except (ValueError, TypeError):
                        pass
    return names


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_PKG), reason="reference tree not mounted"
)
def test_namespace_covers_reference_inventory():
    inventory = _reference_inventory()
    assert len(inventory) > 150  # sanity: the walk actually found the API
    have = set(dir(mmk))
    missing = {
        n
        for n in inventory
        if n not in have and not hasattr(mmk, n)  # hasattr: __getattr__ names
    }
    assert missing <= DOCUMENTED_ABSENCES, sorted(missing - DOCUMENTED_ABSENCES)


def test_flagship_entry_points_exist():
    for name in (
        "SampleRNN",
        "WaveNet",
        "EncoderLSTM",
        "DecoderLSTM",
        "Seq2SeqLSTMNetwork",
        "SimpleTransformer",
        "JukeBox",
        "TrainARMLoop",
        "GenerateLoopV2",
        "Checkpoint",
        "IOSpec",
        "DatasetConfig",
    ):
        assert hasattr(mmk, name), name
