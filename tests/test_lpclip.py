"""lpclip pipeline test: feature extraction (tiny backbone, synthetic data)
-> linear probe over the cached features."""

import os
import sys

import numpy as np


def test_feat_extract_and_probe(tmp_path, monkeypatch):
    sys.path.insert(0, "lpclip")
    import importlib

    feat_extractor = importlib.import_module("feat_extractor")
    linear_probe = importlib.import_module("linear_probe")

    feat_dir = str(tmp_path / "clip_feat")
    for split in ("train", "val", "test"):
        args = feat_extractor.parse_args([
            "--output_dir", feat_dir,
            "--dataset_config_file", "configs/datasets/synthetic.yaml",
            "--split", split,
            "--backbone_name", "test-tiny",
            "--backbone_path", "random",
            "INPUT.SIZE", "(32, 32)",
            "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
        ])
        feat_extractor.main(args)

    data = np.load(os.path.join(feat_dir, "Synthetic", "train.npz"))
    assert data["feature_list"].shape[1] == 64  # tiny embed_dim
    assert len(data["feature_list"]) == len(data["label_list"])

    monkeypatch.chdir(tmp_path)
    args = linear_probe.parse_args([
        "--trainval_dataset", "Synthetic",
        "--test_dataset", "Synthetic",
        "--feature_dir", feat_dir,
        "--num_step", "2",
        "--num_run", "2",
    ])
    linear_probe.main(args)
    report = tmp_path / "report" / "Synthetic"
    files = list(report.glob("*.txt"))
    assert files, "no probe report written"
    content = (report / [f.name for f in files if "details" not in f.name][0]).read_text()
    assert "16 Shot" in content and "1 Shot" in content
