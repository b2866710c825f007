"""Closed-loop eval driver (eval/driver.py) with the REAL tiny policy and a
fake SimplerEnv-shaped sim: multi-episode evaluation, SR aggregation, and
the README-shaped table (VERDICT r2 #5). The real sims are optional deps;
this pins everything up to the env boundary."""
import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")
pytest.importorskip("safetensors")

from spatialvla_tpu.eval.driver import (
    SUITES,
    EvalTask,
    evaluate,
    format_table,
    run_episode,
    save_results,
)
from tests.test_hf_checkpoint import _build_reference_style_checkpoint


@pytest.fixture(scope="module")
def policy(tmp_path_factory):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    d = tmp_path_factory.mktemp("ckpt")
    _build_reference_style_checkpoint(d)
    return SpatialVLAPolicy.from_hf_checkpoint(str(d), param_dtype=None)


class FakeEnv:
    """SimplerEnv-shaped gym env: succeeds iff the cumulative |dx| motion
    crosses a per-env threshold before the step limit; exposes a partial
    flag at half the threshold (like the WidowX 'Grasp X' columns)."""

    def __init__(self, env_id, threshold, horizon=6, seed=0):
        self.env_id = env_id
        self.threshold = threshold
        self.horizon = horizon
        self.rng = np.random.RandomState(seed)
        self.n_resets = 0

    def reset(self):
        self.n_resets += 1
        self.t = 0
        self.travel = 0.0
        return {"image": self._img()}, {}

    def _img(self):
        return (self.rng.rand(64, 80, 3) * 255).astype(np.uint8)

    def get_language_instruction(self):
        return f"do the {self.env_id} task"

    def step(self, action_vec):
        assert np.asarray(action_vec).shape == (7,)
        self.t += 1
        self.travel += float(np.abs(action_vec[0]))
        info = {
            "success": self.travel >= self.threshold,
            "moved_correct_obj": self.travel >= self.threshold / 2,
        }
        done = info["success"] or self.t >= self.horizon
        return {"image": self._img()}, float(info["success"]), done, False, info


def fake_image_getter(env, obs):
    return obs["image"]


def test_run_episode_shapes(policy):
    env = FakeEnv("widowx_spoon_on_towel", threshold=0.0)
    from spatialvla_tpu.eval import SimplerEnvPolicyAdapter

    adapter = SimplerEnvPolicyAdapter(
        policy, unnorm_key="bridge_orig/1.0.0", policy_setup="widowx_bridge"
    )
    ep = run_episode(env, adapter, max_steps=4, image_getter=fake_image_getter)
    assert ep["success"] is True  # threshold 0 -> first step succeeds
    assert ep["steps"] == 1
    assert "moved_correct_obj" in ep["info"]


def test_evaluate_aggregation_and_table(policy, tmp_path):
    # thresholds chosen so tasks land at different SRs: 0 always succeeds,
    # inf never, half-threshold exercises the partial column
    thresholds = {
        "widowx_spoon_on_towel": 0.0,
        "widowx_carrot_on_plate": np.inf,
        "widowx_stack_cube": 0.0,
        "widowx_put_eggplant_in_basket": np.inf,
    }
    tasks = [
        EvalTask(t.label, t.env_id, t.suite, t.policy_setup, t.unnorm_key,
                 episodes=3, max_steps=4, partial_key=t.partial_key)
        for t in SUITES["widowx"]
    ]
    envs = {}

    def factory(task):
        envs[task.env_id] = FakeEnv(task.env_id, thresholds[task.env_id])
        return envs[task.env_id]

    results = evaluate(policy, tasks, env_factory=factory,
                       image_getter=fake_image_getter)
    assert len(results["rows"]) == 4
    by_env = {r["env_id"]: r for r in results["rows"]}
    assert by_env["widowx_spoon_on_towel"]["success_rate"] == 1.0
    assert by_env["widowx_carrot_on_plate"]["success_rate"] == 0.0
    assert by_env["widowx_carrot_on_plate"]["partial_rate"] == 0.0
    assert all(envs[e].n_resets == 3 for e in envs)
    # suite average = mean over the 4 task rows
    assert results["suites"]["widowx"] == pytest.approx(0.5)

    table = format_table(results)
    assert "#Overall Average" in table and "50.0%" in table
    assert "Put Spoon on Towel (Success)" in table

    out = tmp_path / "res.json"
    save_results(str(out), results)
    import json

    loaded = json.loads(out.read_text())
    assert loaded["suites"]["widowx"] == pytest.approx(0.5)


def test_google_suites_merge_drawer_rows(policy):
    """The two drawer env directions merge into ONE 'Open/Close Drawer'
    table row (reference README's column shape), and the suite average is
    over merged rows."""
    tasks = [
        EvalTask(t.label, t.env_id, t.suite, t.policy_setup,
                 "bridge_orig/1.0.0",  # the fabricated ckpt's only stats key
                 episodes=2, max_steps=3)
        for t in SUITES["google_vm"]
    ]
    thresholds = {
        "google_robot_pick_coke_can": 0.0,
        "google_robot_move_near": 0.0,
        "google_robot_open_drawer": 0.0,
        "google_robot_close_drawer": np.inf,  # half the drawer row succeeds
    }
    results = evaluate(
        policy, tasks,
        env_factory=lambda task: FakeEnv(task.env_id, thresholds[task.env_id]),
        image_getter=fake_image_getter,
    )
    assert len(results["rows"]) == 3  # drawer rows merged
    drawer = [r for r in results["rows"] if r["label"] == "Open/Close Drawer"][0]
    assert drawer["episodes"] == 4
    assert drawer["success_rate"] == pytest.approx(0.5)
    assert results["suites"]["google_vm"] == pytest.approx((1 + 1 + 0.5) / 3)
    table = format_table(results)
    assert "Visual Matching" in table and "#Average" in table


def test_variant_aggregation_registry_structure():
    """GOOGLE_ROBOT_VA_TASKS carries the reconstructed variant matrix
    (reference README.md:351-371 Variant Aggregation): non-empty, exactly
    the three reported task columns, every row a variant construction
    (env_kwargs with a scene), and per-task variant axes present
    (backgrounds, lighting, camera poses, table textures)."""
    tasks = SUITES["google_va"]
    assert tasks, "VA registry must not be empty"
    labels = {t.label for t in tasks}
    assert labels == {"Pick Coke Can", "Move Near", "Open/Close Drawer"}
    assert all(t.suite == "google_va" for t in tasks)
    assert all(t.env_kwargs and "scene_name" in t.env_kwargs for t in tasks)
    coke = [t for t in tasks if t.label == "Pick Coke Can"]
    # 3 can orientations per variant; lighting/background/camera/texture
    # axes all present
    assert sum(t.env_kwargs.get("lr_switch") is True for t in coke) >= 1
    assert any("alt_background" in t.env_kwargs["scene_name"] for t in coke)
    assert any(t.env_kwargs.get("slightly_darker_lighting") for t in coke)
    assert any("AltGoogleCamera" in t.env_id for t in coke)
    assert any("Baked" in t.env_kwargs["scene_name"] for t in coke)
    drawer = [t for t in tasks if t.label == "Open/Close Drawer"]
    assert {t.env_id for t in drawer} == {
        "OpenDrawerCustomInScene-v0", "CloseDrawerCustomInScene-v0"
    }
    assert any(t.env_kwargs.get("light_mode") == "darker" for t in drawer)
    assert any(
        t.env_kwargs.get("station_name") == "mk_station3" for t in drawer
    )


def test_variant_aggregation_three_table_output(policy):
    """--suites google_va is no longer a no-op: variant rows sharing a
    label merge into one column per task, and the table renders the
    reference's 'Variant Aggregation' section."""
    # two variant rows per task keeps the fake-env run fast while still
    # exercising the per-label merge
    picked = {}
    for t in SUITES["google_va"]:
        picked.setdefault(t.label, []).append(t)
    tasks = [
        EvalTask(t.label, t.env_id, t.suite, t.policy_setup,
                 "bridge_orig/1.0.0", episodes=1, max_steps=2,
                 env_kwargs=t.env_kwargs)
        for rows in picked.values()
        for t in rows[:2]
    ]
    seen_kwargs = []

    def factory(task):
        assert task.env_kwargs  # the variant construction reaches the env
        seen_kwargs.append(task.env_kwargs)
        return FakeEnv(task.env_id, 0.0)

    results = evaluate(policy, tasks, env_factory=factory,
                       image_getter=fake_image_getter)
    assert len(results["rows"]) == 3  # merged per label
    assert {r["label"] for r in results["rows"]} == {
        "Pick Coke Can", "Move Near", "Open/Close Drawer"
    }
    assert all(r["episodes"] == 2 for r in results["rows"])
    assert results["suites"]["google_va"] == pytest.approx(1.0)
    assert len(seen_kwargs) == 6
    table = format_table(results)
    assert "Variant Aggregation" in table


def test_cli_va_suite_end_to_end(tmp_path, monkeypatch):
    """`run_simpler_eval.py --suites google_va` through the REAL CLI with
    fake sim modules injected: policy load from an HF-format checkpoint,
    the full 57-row Variant-Aggregation matrix via make_simpler_env's raw
    gym.make construction path, aggregation, and the results JSON (round-4
    VERDICT directive 8: the VA-suite CLI smoke that was missing)."""
    import importlib.util
    import json
    import os
    import sys
    import types

    # fake sim stack: simpler_env.make for convenience rows, gymnasium.make
    # + mani_skill2_real2sim registration for the VA env_kwargs rows, and
    # the maniskill2 camera extractor used by default_image_getter
    fake_simpler = types.ModuleType("simpler_env")
    fake_simpler.make = lambda env_id: FakeEnv(env_id, threshold=0.0)
    utils = types.ModuleType("simpler_env.utils")
    env_m = types.ModuleType("simpler_env.utils.env")
    obs_m = types.ModuleType("simpler_env.utils.env.observation_utils")
    obs_m.get_image_from_maniskill2_obs_dict = lambda env, obs: obs["image"]
    fake_simpler.utils = utils
    utils.env = env_m
    env_m.observation_utils = obs_m
    fake_gym = types.ModuleType("gymnasium")
    made_kwargs = []

    def gym_make(env_id, **kw):
        made_kwargs.append((env_id, kw))
        return FakeEnv(env_id, threshold=0.0)

    fake_gym.make = gym_make
    fake_ms = types.ModuleType("mani_skill2_real2sim")
    fake_ms.envs = types.ModuleType("mani_skill2_real2sim.envs")
    for name, m in {
        "simpler_env": fake_simpler,
        "simpler_env.utils": utils,
        "simpler_env.utils.env": env_m,
        "simpler_env.utils.env.observation_utils": obs_m,
        "gymnasium": fake_gym,
        "mani_skill2_real2sim": fake_ms,
        "mani_skill2_real2sim.envs": fake_ms.envs,
    }.items():
        monkeypatch.setitem(sys.modules, name, m)

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    _build_reference_style_checkpoint(ckpt)
    # the VA tasks unnormalize with the google-robot fractal statistics;
    # the fabricated checkpoint ships only bridge — alias them
    pc = ckpt / "processor_config.json"
    proc = json.loads(pc.read_text())
    proc["statistics"]["fractal20220817_data/0.1.0"] = proc["statistics"][
        "bridge_orig/1.0.0"
    ]
    pc.write_text(json.dumps(proc))

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "run_simpler_eval.py",
    )
    spec = importlib.util.spec_from_file_location("run_simpler_eval_va", script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "va_results.json"
    rc = mod.main([
        "--checkpoint_dir", str(ckpt), "--hf", "--suites", "google_va",
        "--episodes", "1", "--quantize_bits", "0", "--out", str(out),
    ])
    assert rc == 0
    results = json.loads(out.read_text())
    assert "google_va" in results["suites"]
    # threshold-0 fake envs: every episode succeeds -> VA average 1.0
    assert results["suites"]["google_va"] == pytest.approx(1.0)
    # the VA rows went through the raw-construction path with their variant
    # kwargs (not simpler_env.make)
    assert len(made_kwargs) == len(SUITES["google_va"])
    assert any(kw for _, kw in made_kwargs)


def test_cli_reports_missing_sim(tmp_path):
    """run_simpler_eval exits 2 with guidance when simpler_env is absent."""
    import importlib.util
    import os

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "run_simpler_eval.py",
    )
    spec = importlib.util.spec_from_file_location("run_simpler_eval", script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(["--checkpoint_dir", str(tmp_path)])
    assert rc == 2


# ---------------------------------------------------------------------------
# LIBERO driver (reference README.md:579-590 table shape)
# ---------------------------------------------------------------------------

class FakeLiberoEnv:
    """Robosuite-shaped env: 4-tuple step, dict obs with agentview_image;
    succeeds iff cumulative |dx| crosses the threshold."""

    def __init__(self, threshold, horizon=5, seed=0):
        self.threshold = threshold
        self.horizon = horizon
        self.rng = np.random.RandomState(seed)
        self.n_resets = 0

    def reset(self):
        self.n_resets += 1
        self.t = 0
        self.travel = 0.0
        return {"agentview_image": self._img()}

    def _img(self):
        return (self.rng.rand(64, 64, 3) * 255).astype(np.uint8)

    def step(self, action):
        action = np.asarray(action)
        assert action.shape == (7,)
        assert action[6] in (-1.0, 1.0)  # libero gripper convention
        self.t += 1
        self.travel += float(np.abs(action[0]))
        success = self.travel >= self.threshold
        done = success or self.t >= self.horizon
        return (
            {"agentview_image": self._img()},
            float(success),
            done,
            {"success": success},
        )


def test_libero_episode_and_suite_aggregation(policy):
    from spatialvla_tpu.eval.driver import (
        LiberoSuite,
        evaluate_libero,
        format_libero_table,
    )

    suites = [
        LiberoSuite("LIBERO-Spatial", "libero_spatial", max_steps=4),
        LiberoSuite("LIBERO-Object", "libero_object", max_steps=4),
    ]
    thresholds = {"libero_spatial": 0.0, "libero_object": np.inf}
    made = []

    def task_factory(suite):
        for i in range(2):  # two tasks per suite
            env = FakeLiberoEnv(thresholds[suite.benchmark])
            made.append(env)
            yield f"task {i} of {suite.benchmark}", env

    results = evaluate_libero(
        policy, suites, task_factory=task_factory, episodes_per_task=2,
        unnorm_key="bridge_orig/1.0.0",
    )
    assert [r["label"] for r in results["rows"]] == [
        "LIBERO-Spatial", "LIBERO-Object",
    ]
    spatial, obj = results["rows"]
    assert spatial["episodes"] == 4 and spatial["success_rate"] == 1.0
    assert obj["success_rate"] == 0.0
    assert spatial["stderr"] == pytest.approx(0.0)  # p in {0,1} -> se 0
    assert results["average"]["success_rate"] == pytest.approx(0.5)
    assert all(e.n_resets == 2 for e in made)

    table = format_libero_table(results)
    assert "LIBERO-Spatial" in table and "Average" in table
    assert "100.0 ± 0.0%" in table and "50.0 ±" in table


def test_libero_parallel_envs_matches_serial(policy):
    from spatialvla_tpu.eval.driver import LiberoSuite, evaluate_libero

    suites = [
        LiberoSuite("LIBERO-Spatial", "libero_spatial", max_steps=4),
        LiberoSuite("LIBERO-Object", "libero_object", max_steps=4),
    ]
    thresholds = {"libero_spatial": 0.0, "libero_object": np.inf}
    made = []

    def task_factory(suite):
        for i in range(2):
            def make_env(suite=suite):
                env = FakeLiberoEnv(thresholds[suite.benchmark])
                made.append(env)
                return env

            yield f"task {i} of {suite.benchmark}", make_env

    kw = dict(task_factory=task_factory, episodes_per_task=3,
              unnorm_key="bridge_orig/1.0.0")
    serial = evaluate_libero(policy, suites, **kw)
    n_serial_envs = len(made)
    parallel = evaluate_libero(policy, suites, parallel_envs=3, **kw)
    # SR equality + exact episode counts: the shared counter must not
    # over- or under-run when N threads pull from it
    for rs, rp in zip(serial["rows"], parallel["rows"]):
        assert rp["episodes"] == rs["episodes"] == 6
        assert rp["success_rate"] == rs["success_rate"]
    assert parallel["average"] == serial["average"]
    # 3 envs per task in parallel mode, 1 per task serially
    assert len(made) - n_serial_envs == 3 * 4 and n_serial_envs == 4


def test_libero_parallel_requires_env_factories(policy):
    from spatialvla_tpu.eval.driver import LiberoSuite, evaluate_libero

    suites = [LiberoSuite("LIBERO-Spatial", "libero_spatial", max_steps=4)]

    def task_factory(suite):
        yield "task", FakeLiberoEnv(0.0)  # env instance, not a factory

    with pytest.raises(ValueError, match="zero-arg env factory"):
        evaluate_libero(policy, suites, task_factory=task_factory,
                        episodes_per_task=1, parallel_envs=2,
                        unnorm_key="bridge_orig/1.0.0")


def test_libero_cli_reports_missing_sim(tmp_path):
    import importlib.util
    import os

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "run_libero_eval.py",
    )
    spec = importlib.util.spec_from_file_location("run_libero_eval", script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(["--checkpoint_dir", str(tmp_path)])
    assert rc == 2


def test_evaluate_parallel_envs_matches_serial(policy):
    """parallel_envs=2: each task runs its episodes on 2 env instances
    whose queries coalesce through a shared ServingEngine; the aggregated
    SRs must equal the serial run's (the fake env's outcome depends only
    on the motion threshold, not on episode assignment), the shared
    episode counter must not over- or under-run, and every env instance
    must be used."""
    thresholds = {
        "widowx_spoon_on_towel": 0.0,
        "widowx_carrot_on_plate": np.inf,
        "widowx_stack_cube": 0.0,
        "widowx_put_eggplant_in_basket": np.inf,
    }
    tasks = [
        EvalTask(t.label, t.env_id, t.suite, t.policy_setup, t.unnorm_key,
                 episodes=5, max_steps=4, partial_key=t.partial_key)
        for t in SUITES["widowx"]
    ]
    made = []

    def factory(task):
        env = FakeEnv(task.env_id, thresholds[task.env_id], seed=len(made))
        made.append(env)
        return env

    results = evaluate(policy, tasks, env_factory=factory,
                       image_getter=fake_image_getter, parallel_envs=2)
    assert len(made) == 8  # 2 env instances per task
    by_env = {r["env_id"]: r for r in results["rows"]}
    assert by_env["widowx_spoon_on_towel"]["success_rate"] == 1.0
    assert by_env["widowx_carrot_on_plate"]["success_rate"] == 0.0
    assert all(r["episodes"] == 5 for r in results["rows"])
    # the shared counter handed out exactly `episodes` episodes per task
    resets = {}
    for env in made:
        resets[env.env_id] = resets.get(env.env_id, 0) + env.n_resets
    assert all(v == 5 for v in resets.values())
    assert results["suites"]["widowx"] == pytest.approx(0.5)
