"""ResNet1d parity vs the reference torch modules (disabled in the
reference; implemented and usable here)."""
import numpy as np
import pytest

import jax

from deepsignal_plant_tpu.models.resnet1d import (convert_torch_resnet3,
                                                  get_lout, init_resnet3,
                                                  resnet3)

torch = pytest.importorskip("torch")


def test_get_lout_matches_reference(reference_importable):
    from deepsignal_plant.models import get_lout as ref_get_lout
    for strides in [(1, 2, 2), (1, 1, 1), (2, 2, 2)]:
        for lin in (13, 16, 100):
            assert get_lout(lin, strides) == ref_get_lout(lin, strides)


def test_resnet3_forward_parity(reference_importable, rng):
    from deepsignal_plant.models import ResNet3 as TorchResNet3
    tm = TorchResNet3(out_channels=32, strides=(1, 2, 2), init_channels=1,
                      in_planes=4)
    tm.eval()
    params = convert_torch_resnet3(tm.state_dict())
    x = rng.normal(size=(4, 1, 16)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.tensor(x)).numpy()
    j_out, _ = resnet3(x, params, train=False)
    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-5,
                               rtol=2e-5)


def test_resnet3_train_mode_updates_stats(rng):
    params = init_resnet3(jax.random.PRNGKey(0), out_channels=16)
    x = rng.normal(size=(8, 1, 16)).astype(np.float32)
    out, new_params = resnet3(x, params, train=True)
    assert out.shape[0] == 8 and out.shape[1] == 16
    # running stats moved
    assert not np.allclose(np.asarray(new_params["bn1"]["mean"]),
                           np.asarray(params["bn1"]["mean"]))
