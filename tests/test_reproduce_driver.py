"""Orchestration tests for ``scripts/reproduce_baseline.py`` — the unattended
BASELINE.md reproduce-all driver.

The datasets the driver targets do not exist in this image, so these tests
pin what IS testable without them: the plan covers every BASELINE.md number,
dependencies execute in order, preflight failure text names each missing
dataset precisely, per-row accuracy assertions fire on shortfall, and
completed stages are skipped on restart (resume safety)."""

import argparse
import importlib.util
import json
import os
import re
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


@pytest.fixture(scope="module")
def driver():
    sys.path.insert(0, SCRIPTS)
    try:
        spec = importlib.util.spec_from_file_location(
            "reproduce_baseline", os.path.join(SCRIPTS, "reproduce_baseline.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules["reproduce_baseline"] = mod  # dataclasses resolve __module__
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(SCRIPTS)


# every accuracy number BASELINE.md publishes (percent)
BASELINE_NUMBERS = {
    92.30, 93.15, 93.55, 94.16, 92.90, 93.03,       # SVM x2, MN40 ft/vote x2
    88.89, 93.45, 90.36, 87.75, 94.14, 91.04,       # ScanObjectNN x6
    84.49, 86.04, 84.91, 86.52,                     # seg mIoU x4
    97.0, 98.3, 93.1, 95.2,                         # few-shot x4
}


def _args(out, tolerance=0.5, force=False):
    return argparse.Namespace(out=str(out), tolerance=tolerance, force=force,
                              data_root="/nonexistent")


class TestPlan:
    def test_plan_covers_every_baseline_number(self, driver):
        stages = driver.build_plan("/tmp/x")
        targets = {v for s in stages for v in s.expect.values()}
        assert targets == BASELINE_NUMBERS, (
            "driver plan must assert EVERY published number; "
            f"missing={BASELINE_NUMBERS - targets} extra={targets - BASELINE_NUMBERS}")

    def test_deps_precede_dependents_and_requires_are_known(self, driver):
        stages = driver.build_plan("/tmp/x")
        seen = set()
        for s in stages:
            for dep in s.deps:
                assert dep in seen, f"{s.name} depends on later/unknown stage {dep}"
            for key in s.requires:
                assert key in driver.DATASET_REQS, f"{s.name}: unknown dataset {key}"
            seen.add(s.name)
        # the two pretrains anchor the DAG
        names = [s.name for s in stages]
        assert names.index("teacher") < names.index("gm3d_pretrain")
        assert names.index("ft_mn40") < names.index("vote_mn40")
        assert names.index("m2ae_pretrain") < names.index("m2ae_seg")

    def test_stage_commands_use_repo_configs(self, driver):
        for s in driver.build_plan("/tmp/x"):
            if not s.argv:
                continue
            cfg = s.argv[s.argv.index("--config") + 1]
            assert os.path.exists(os.path.join(driver.REPO, cfg)), cfg

    def test_stage_argv_parses_against_real_cli_parsers(self, driver, monkeypatch):
        """Every stage's flags must be accepted by the target CLI's actual
        argparse — a renamed/removed flag would otherwise only surface hours
        into a real reproduction run."""
        import importlib

        for s in driver.build_plan("/tmp/x"):
            if not s.argv:
                continue
            assert s.argv[0] == "-m"
            mod = importlib.import_module(s.argv[1])
            monkeypatch.setattr(sys, "argv", ["prog"] + list(s.argv[2:]))
            args = mod.parse_args()  # SystemExit(2) on any unknown flag
            assert args.config  # required flag made it through


class TestPreflight:
    def test_names_each_missing_dataset_precisely(self, driver, tmp_path):
        stages = driver.build_plan("/tmp/x")
        with pytest.raises(driver.StageError) as ei:
            driver.preflight(stages, str(tmp_path))
        msg = str(ei.value)
        for key in ("shapenet55", "modelnet40", "scanobjectnn_main",
                    "scanobjectnn_nobg", "shapenetpart"):
            assert f"dataset '{key}' missing" in msg
            assert driver.DATASET_REQS[key].hint.split(":")[0] in msg
        assert "absent: " in msg and "ShapeNet55-34" in msg

    def test_fewshot_folds_generatable_from_modelnet(self, driver, tmp_path):
        """ModelNetFewshot absence alone must NOT fail preflight when
        ModelNet40 is present — the driver generates the folds."""
        mn = tmp_path / "ModelNet" / "modelnet40_normal_resampled"
        mn.mkdir(parents=True)
        for f in ("modelnet40_shape_names.txt", "modelnet40_train.txt",
                  "modelnet40_test.txt"):
            (mn / f).write_text("")
        fs_stages = [s for s in driver.build_plan("/tmp/x")
                     if s.requires == ("modelnet_fewshot",)]
        assert fs_stages
        driver.preflight(fs_stages, str(tmp_path))  # must not raise


def _fake_runner(record, results_by_stage):
    """Stand-in runner: records execution order and fabricates the stage's
    output files so metric extraction exercises the real parsing code."""

    def runner(stage, args):
        record.append(stage.name)
        stage_dir = os.path.join(args.out, stage.name)
        os.makedirs(stage_dir, exist_ok=True)
        vals = results_by_stage.get(stage.name, {})
        jsonl_rows, stdout = [], []
        for field, mdef in stage.metrics.items():
            kind, spec = mdef[0], mdef[1]
            unit = mdef[2] if len(mdef) > 2 else "auto"
            v = vals.get(field, 99.9)  # percent, the driver's canonical unit
            # fabricate the value in the unit the REAL CLI emits it in
            if unit == "frac":
                raw = v / 100.0
            elif unit == "pct":
                raw = v
            else:  # auto: legacy behavior (jsonl raw, regex fraction)
                raw = v / 100.0 if kind == "regex" else v
            if kind in ("jsonl_max", "jsonl_last"):
                jsonl_rows.append({spec: raw})
            else:
                # invert the regex: substitute the capture group, unescape
                stdout.append(
                    spec.replace("([0-9.]+)", f"{raw:.4f}").replace("\\", ""))
        if jsonl_rows:
            with open(os.path.join(stage_dir, "log.txt"), "w") as f:
                for row in jsonl_rows:
                    f.write(json.dumps(row) + "\n")
        with open(os.path.join(stage_dir, "driver_stdout.log"), "w") as f:
            f.write("\n".join(stdout))

    return runner


class TestRun:
    def test_full_plan_order_and_markers(self, driver, tmp_path):
        stages = driver.build_plan(str(tmp_path))
        record = []
        out = driver.run(stages, _args(tmp_path),
                         runner=_fake_runner(record, {}), report=lambda m: None)
        assert record == [s.name for s in stages]  # exact declared order
        for s in stages:
            assert os.path.exists(
                os.path.join(tmp_path, s.name, ".reproduce_done.json"))
        assert out["gm3d_pretrain"]["val_svm_acc"] == 99.9

    def test_restart_skips_completed_stages(self, driver, tmp_path):
        stages = driver.build_plan(str(tmp_path))[:2]  # teacher, gm3d_pretrain
        first, second = [], []
        driver.run(stages, _args(tmp_path), runner=_fake_runner(first, {}),
                   report=lambda m: None)
        driver.run(stages, _args(tmp_path), runner=_fake_runner(second, {}),
                   report=lambda m: None)
        assert first == ["teacher", "gm3d_pretrain"] and second == []

    def test_below_target_row_fails_with_named_shortfall(self, driver, tmp_path):
        stages = driver.build_plan(str(tmp_path))[:2]
        rec = []
        fake = _fake_runner(rec, {"gm3d_pretrain": {"val_svm_acc": 80.0}})
        with pytest.raises(driver.StageError) as ei:
            driver.run(stages, _args(tmp_path), runner=fake,
                       report=lambda m: None)
        msg = str(ei.value)
        assert "gm3d_pretrain.val_svm_acc = 80.00 < target 92.30" in msg
        # a failed row must NOT mark the stage complete
        assert not os.path.exists(
            os.path.join(tmp_path, "gm3d_pretrain", ".reproduce_done.json"))

    def test_missing_dependency_is_a_hard_error(self, driver, tmp_path):
        stages = [s for s in driver.build_plan(str(tmp_path))
                  if s.name == "ft_mn40"]
        with pytest.raises(driver.StageError, match="needs 'gm3d_pretrain'"):
            driver.run(stages, _args(tmp_path),
                       runner=_fake_runner([], {}), report=lambda m: None)

    @pytest.mark.slow
    def test_real_subprocess_stage_end_to_end(self, driver, tmp_path,
                                              monkeypatch):
        """The REAL exec_stage path: the teacher stage launched as an actual
        subprocess (tiny synthetic shapes via --extra_args), its JSONL log
        parsed by the real metric extraction, the completion marker written —
        the non-fake half of the driver proven executable."""
        monkeypatch.setenv("GM3D_PLATFORM", "cpu")  # subprocess env
        args = argparse.Namespace(
            out=str(tmp_path), tolerance=0.5, force=False,
            data_root="/nonexistent",
            extra_args="--synthetic --epochs 1 --batch_size 8 "
                       "--synthetic_samples 16")
        stages = [s for s in driver.build_plan(str(tmp_path))
                  if s.name == "teacher"]
        out = driver.run(stages, args, report=lambda m: None)  # real runner
        assert 0.0 <= out["teacher"]["val_svm_acc"] <= 100.0
        assert os.path.exists(
            os.path.join(tmp_path, "teacher", ".reproduce_done.json"))
        assert os.path.exists(
            os.path.join(tmp_path, "teacher", "ckpt"))
        # restart must skip without touching the subprocess again
        rec = []
        driver.run(stages, args, runner=_fake_runner(rec, {}),
                   report=lambda m: None)
        assert rec == []

    def test_vote_regex_metric_parses_stdout(self, driver, tmp_path):
        """The vote stages parse '[TEST_VOTE] acc = 0.xxxx' from the captured
        CLI output — exercise the real regex + percent normalisation."""
        stage = [s for s in driver.build_plan(str(tmp_path))
                 if s.name == "vote_mn40"][0]
        stage_dir = os.path.join(str(tmp_path), "vote_mn40")
        os.makedirs(stage_dir)
        # the CLI logs vote_acc in PERCENT (cli/finetune.py::evaluate_vote
        # returns accuracy * 100); the stage records unit "pct" so a
        # collapsed sub-1% run can't be rescaled into passing
        with open(os.path.join(stage_dir, "driver_stdout.log"), "w") as f:
            f.write("[TEST_VOTE_time 1] acc = 93.0100, best acc = 93.0100\n"
                    "[TEST_VOTE] acc = 94.1600\n")
        kind, spec, unit = stage.metrics["vote_acc"]
        assert unit == "pct"
        val = driver.extract_metric(kind, spec, stage_dir,
                                    os.path.join(stage_dir, "driver_stdout.log"),
                                    unit)
        assert val == pytest.approx(94.16)
        # a collapsed 0.94% run must NOT normalise into a pass
        with open(os.path.join(stage_dir, "driver_stdout.log"), "w") as f:
            f.write("[TEST_VOTE] acc = 0.9416\n")
        val = driver.extract_metric(kind, spec, stage_dir,
                                    os.path.join(stage_dir, "driver_stdout.log"),
                                    unit)
        assert val == pytest.approx(0.9416)

    def test_svm_protocol_ab_stage_reports_both(self, driver, tmp_path):
        """Round-5 (verdict r4 #4): the m2ae_svm_protocol_ab stage parses
        BOTH pooling protocols' accuracies plus the best — the 93.15 target
        can't be forfeited by a protocol guess."""
        stage = [s for s in driver.build_plan(str(tmp_path))
                 if s.name == "m2ae_svm_protocol_ab"][0]
        assert stage.deps == ("m2ae_pretrain",)
        assert "--svm_scales" in stage.argv and "both" in stage.argv
        stage_dir = os.path.join(str(tmp_path), "m2ae_svm_protocol_ab")
        os.makedirs(stage_dir)
        log = os.path.join(stage_dir, "driver_stdout.log")
        with open(log, "w") as f:
            f.write("[PROBE svm] acc = 93.1500 (svm_scales=all)\n"
                    "[PROBE svm] acc = 92.8000 (svm_scales=last)\n"
                    "[PROBE svm] best = 93.1500 (svm_scales=all)\n")
        got = {}
        for field, (kind, spec, unit) in stage.metrics.items():
            got[field] = driver.extract_metric(kind, spec, stage_dir, log, unit)
        assert got == {"svm_all": pytest.approx(93.15),
                       "svm_last": pytest.approx(92.80),
                       "svm_best": pytest.approx(93.15)}
        assert stage.expect == {"svm_best": 93.15}
