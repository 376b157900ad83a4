"""Config system tests: defaults schema, YAML merge (incl. the reference
scene configs), freezing, type coercion, override lists."""

import pytest

from stnerf_tpu.config import CfgNode, get_cfg


class TestCfgNode:
    def test_attribute_access_and_merge(self):
        cfg = get_cfg()
        assert cfg.MODEL.COARSE_RAY_SAMPLING == 64
        cfg.merge_from_other_cfg({"MODEL": {"COARSE_RAY_SAMPLING": 90}})
        assert cfg.MODEL.COARSE_RAY_SAMPLING == 90
        # untouched siblings preserved
        assert cfg.MODEL.FINE_RAY_SAMPLING == 80

    def test_freeze(self):
        cfg = get_cfg()
        cfg.freeze()
        with pytest.raises((AttributeError, KeyError)):
            cfg.MODEL.USE_DIR = False
        cfg.defrost()
        cfg.MODEL.USE_DIR = False
        assert cfg.MODEL.USE_DIR is False

    def test_clone_is_independent(self):
        a = get_cfg()
        b = a.clone()
        b.SOLVER.BASE_LR = 123.0
        assert a.SOLVER.BASE_LR != 123.0

    def test_scientific_notation_string_coerced(self, tmp_path):
        # YAML parses "1e10" as a *string*; the reference configs rely on
        # float coercion against the default's type
        p = tmp_path / "c.yml"
        p.write_text("MODEL:\n  BOARDER_WEIGHT: 1e10\n")
        cfg = get_cfg()
        cfg.merge_from_file(str(p))
        assert isinstance(cfg.MODEL.BOARDER_WEIGHT, float)
        assert cfg.MODEL.BOARDER_WEIGHT == 1e10

    def test_merge_from_list(self):
        cfg = get_cfg()
        cfg.merge_from_list(["SOLVER.BASE_LR", "0.01", "MODEL.USE_DIR", "False"])
        assert cfg.SOLVER.BASE_LR == 0.01
        assert cfg.MODEL.USE_DIR is False

    def test_dump_roundtrip(self):
        cfg = get_cfg()
        text = cfg.dump()
        import yaml

        data = yaml.safe_load(text)
        assert data["MODEL"]["COARSE_RAY_SAMPLING"] == 64


class TestSceneConfigs:
    @pytest.mark.parametrize("name,expect", [
        ("configs/config_walking.yml",
         dict(frames=50, offset=25, use_label=False, space_time=False, scale=1.0)),
        ("configs/config_taekwondo.yml",
         dict(frames=101, offset=0, use_label=True, space_time=True, scale=0.1)),
    ])
    def test_reference_scene_values(self, name, expect):
        cfg = get_cfg()
        cfg.merge_from_file(name)
        assert cfg.DATASETS.FRAME_NUM == expect["frames"]
        assert cfg.DATASETS.FRAME_OFFSET == expect["offset"]
        assert cfg.DATASETS.USE_LABEL == expect["use_label"]
        assert cfg.MODEL.USE_SPACE_TIME == expect["space_time"]
        assert cfg.DATASETS.SCALE == expect["scale"]
        assert cfg.MODEL.SAMPLE_METHOD == "BBOX"
        assert cfg.MODEL.COARSE_RAY_SAMPLING == 90
        assert cfg.MODEL.FINE_RAY_SAMPLING == 30
        assert cfg.SOLVER.BASE_LR == 4e-4
        assert cfg.DATASETS.LAYER_NUM == 2

    def test_pickle_roundtrip(self):
        """Configs cross process boundaries in multiprocessing ray
        pregeneration — dict-subclass pickling must preserve values and the
        frozen flag (plain dict reduce restores items before instance
        state, tripping the frozen check)."""
        import pickle

        cfg = get_cfg()
        cfg.MODEL.COARSE_RAY_SAMPLING = 17
        back = pickle.loads(pickle.dumps(cfg))
        assert back.MODEL.COARSE_RAY_SAMPLING == 17
        assert not back.is_frozen()
        back.MODEL.FINE_RAY_SAMPLING = 3  # still mutable

        cfg.freeze()
        frozen = pickle.loads(pickle.dumps(cfg))
        assert frozen.is_frozen()
        assert frozen.MODEL.COARSE_RAY_SAMPLING == 17

    def test_spec_from_scene_config(self):
        from stnerf_tpu.models.layered import LayeredSpec

        cfg = get_cfg()
        cfg.merge_from_file("configs/config_taekwondo.yml")
        spec = LayeredSpec.from_cfg(cfg)
        assert spec.layer_num == 2
        assert spec.use_space_time and spec.use_deform_time
        # DEEP_RGB False in the scene config -> no deep head even though
        # USE_SPACE_TIME is on (ref: modeling/layered_rfrender.py:35)
        assert spec.deep_rgb is False
        assert spec.coarse_samples == 90
