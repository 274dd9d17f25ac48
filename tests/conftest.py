import warnings

import pytest

warnings.filterwarnings("ignore")

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def images_path(ray_session):
    """600-row deterministic image+caption fixture (cached in /tmp)."""
    from dataquality_cli_ray.fixtures.images import generate_images_parquet

    return generate_images_parquet(600, use_ray=False)


@pytest.fixture(scope="session")
def models():
    from dataquality_cli_ray.pipelines.quality import build_models

    return build_models()
