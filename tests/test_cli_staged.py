"""Full staged-recipe chain through the CLI — the workflow the reference runs
by hand across four scripts (train_2ddense.py -> train_hybrid.py -arch 3dpart
via the two_model loader topology.py:3250 -> -arch end2end via
train_hybrid.py:152 -> test.py -> leaderboard):

    synth-data -> train 2d -> export-weights -> convert-weights
      -> train 3dpart --init-from (npz AND orbax dir) -> train end2end
      -> test -> evaluate

Asserts the cross-stage warm-start actually lands (loaded >> skipped — this
is where layer-name/layout drift between the 2D graph and the hybrid graph
would bite) and that the final CLI segmentation produces a sane labelmap.
"""
from __future__ import annotations

import re

import numpy as np
import pytest

from hdenseunet_tpu import cli
from hdenseunet_tpu.data import nifti, preprocess

TINY = [
    "--set", "model.preset", "tiny",
    "--set", "model.input_size", "64",
    "--set", "train.remat", "false",
    "--set", "train.checkpoint_every_steps", "2",
]


def _warm_start_counts(text: str) -> tuple[int, int]:
    m = re.search(r"warm start: (\d+) layers loaded, (\d+) skipped", text)
    assert m, f"no warm-start report in:\n{text}"
    return int(m.group(1)), int(m.group(2))


@pytest.mark.slow
def test_staged_recipe_chain(tmp_path, capsys):
    prep = tmp_path / "prep"
    cli.main(["synth-data", "--out", str(prep), "--num-volumes", "2",
              "--shape", "64,64,24", "--seed", "5"])

    # ---- stage 1: 2D training (train_2ddense.py role) --------------------
    ck2d = tmp_path / "ck2d"
    cli.main(["train", "--arch", "2d", "--data", str(prep), "--batch", "8",
              "--max-steps", "4", "--checkpoint-dir", str(ck2d),
              "--set", "data.crop_threads", "2", *TINY])

    # ---- export + convert round-trip (topology.py:2847 HDF5 layout) ------
    h5 = tmp_path / "stage2d.h5"
    npz = tmp_path / "stage2d.npz"
    cli.main(["export-weights", str(ck2d), str(h5), "--arch", "2d", *TINY])
    cli.main(["convert-weights", str(h5), str(npz)])

    # ---- stage 2: hybrid 3dpart seeded from the 2D stage ------------------
    capsys.readouterr()
    ck3d = tmp_path / "ck3d"
    cli.main(["train", "--arch", "3dpart", "--data", str(prep), "--batch", "8",
              "--max-steps", "2", "--checkpoint-dir", str(ck3d),
              "--init-from", str(npz), *TINY])
    loaded, skipped = _warm_start_counts(capsys.readouterr().out)
    # every 2D-branch layer of the hybrid graph must match the exported names;
    # only the 3D branch + HFF head may be missing from the 2D checkpoint
    assert loaded > 2 * skipped and loaded > 20, (loaded, skipped)

    # the documented orbax-directory form of --init-from must land the same
    capsys.readouterr()
    cli.main(["train", "--arch", "3dpart", "--data", str(prep), "--batch", "8",
              "--max-steps", "1", "--checkpoint-dir", str(tmp_path / "ck3d_dir"),
              "--init-from", str(ck2d), *TINY])
    loaded_dir, _ = _warm_start_counts(capsys.readouterr().out)
    assert loaded_dir == loaded

    # ---- stage 3: end2end fine-tune seeded from 3dpart --------------------
    capsys.readouterr()
    cke = tmp_path / "cke2e"
    cli.main(["train", "--arch", "end2end", "--data", str(prep), "--batch", "8",
              "--max-steps", "2", "--checkpoint-dir", str(cke),
              "--init-from", str(ck3d), *TINY])
    loaded_e, skipped_e = _warm_start_counts(capsys.readouterr().out)
    assert skipped_e == 0 and loaded_e > loaded, (loaded_e, skipped_e)

    # ---- test CLI: segment a volume with the trained end2end model --------
    test_dir = tmp_path / "testdata"
    mask_dir = tmp_path / "livermask"
    truth_dir = tmp_path / "truth"
    results = tmp_path / "results"
    for d in (test_dir, mask_dir, truth_dir):
        d.mkdir()
    vol = np.load(prep / "volumes" / "volume-0.npy")
    seg = np.load(prep / "segmentations" / "segmentation-0.npy")
    nifti.write(test_dir / "test-volume-0.nii", vol.astype(np.float32))
    nifti.write(mask_dir / "0-ori.nii", (seg >= 1).astype(np.int16))
    nifti.write(truth_dir / "segmentation-0.nii", seg.astype(np.int16))

    cli.main(["test", "--data", str(test_dir), "--livermask", str(mask_dir),
              "--save-path", str(results), "--weights", str(cke),
              "--arch", "end2end", "--num-volumes", "1",
              "--set", "model.preset", "tiny",
              "--set", "infer.input_size", "64",
              "--set", "infer.window_batch", "2"])

    out, _ = nifti.read(results / "test-segmentation-0.nii")
    out = np.asarray(out)
    assert out.shape == vol.shape
    assert set(np.unique(out)) <= {0, 1, 2}

    # ---- evaluate CLI ------------------------------------------------------
    capsys.readouterr()
    cli.main(["evaluate", "--pred", str(results), "--truth", str(truth_dir),
              "--num-volumes", "1"])
    text = capsys.readouterr().out
    assert "mean per-case Dice" in text
