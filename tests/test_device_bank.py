"""DeviceLatentBank: in-graph batch sampling == host collate semantics.

The bank replaces the host DataLoader+collate upload path for diffusion
training (reference collate semantics at
/root/reference/after/diffusion/utils.py:45-108); these tests pin the crop/
augment/weight distributions structurally and drive the CLI flag.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from after_tpu.dataset import AudioExample, RecordWriter
from after_tpu.dataset.device_bank import DeviceLatentBank

N_SIGNAL = 16


class ListDataset(list):
    pass


def make_items(n=4, t=64, c=6, aug=None, aug_t=None, seed=0, id0=0):
    """aug: name of an augment key; aug_t: its length (None = same as t)."""
    rng = np.random.RandomState(seed)
    items = ListDataset()
    for i in range(id0, id0 + n):
        # channel 0 carries the frame index + record id so any crop's
        # source offset is recoverable from its values
        z = rng.randn(c, t).astype(np.float32)
        z[0] = 1000.0 * i + np.arange(t)
        item = {"z": z}
        if aug is not None:
            ta = t if aug_t is None else aug_t
            a = rng.randn(c, ta).astype(np.float32)
            a[0] = -(1000.0 * i + np.arange(ta)) - 1
            item[aug] = a
        items.append(item)
    return items


def test_sample_shapes_and_aliasing():
    bank = DeviceLatentBank(make_items(), N_SIGNAL)
    batch = bank.sample(jax.random.PRNGKey(0), 8)
    assert batch["x"].shape == (8, N_SIGNAL, 6)
    assert batch["x_cond"].shape == (8, N_SIGNAL, 6)
    # audio structure is x itself (jit returns distinct Array objects for
    # the duplicated output, but the values are one and the same)
    np.testing.assert_array_equal(np.asarray(batch["x_time_cond"]),
                                  np.asarray(batch["x"]))
    assert batch["x"].dtype == jnp.float32


def test_crops_are_contiguous_slices():
    items = make_items(n=3, t=64)
    bank = DeviceLatentBank(items, N_SIGNAL)
    for s in range(5):
        x = np.asarray(bank.sample(jax.random.PRNGKey(s), 16)["x"])
        marks = x[..., 0]                       # (B, n_signal)
        rec = np.floor(marks[:, 0] / 1000).astype(int)
        off = marks[:, 0] - 1000 * rec
        assert ((0 <= rec) & (rec < 3)).all()
        assert ((0 <= off) & (off <= 64 - N_SIGNAL)).all()
        # frames increase by exactly 1 inside each crop
        np.testing.assert_allclose(np.diff(marks, axis=1), 1.0, atol=1e-4)


def test_augment_selected_and_mixed_with_z():
    items = make_items(n=2, t=64, aug="z_aug_0")
    bank = DeviceLatentBank(items, N_SIGNAL, aug_keys=("z_aug_0",))
    xc = np.asarray(bank.sample(jax.random.PRNGKey(1), 64)["x_cond"])
    # with one valid augment key the host collate ALWAYS uses it
    # (which = randint over aug keys; fallback only when too short)
    assert (xc[..., 0] < 0).all(), "timbre crops must come from the augment"


def test_augment_too_short_falls_back_to_z():
    items = make_items(n=2, t=64, aug="z_aug_0", aug_t=N_SIGNAL)  # < n+1
    bank = DeviceLatentBank(items, N_SIGNAL, aug_keys=("z_aug_0",))
    xc = np.asarray(bank.sample(jax.random.PRNGKey(2), 32)["x_cond"])
    assert (xc[..., 0] >= 0).all(), "short augments must fall back to z"


def test_timbre_limit_windows_the_cond_crop():
    items = make_items(n=1, t=256)
    bank = DeviceLatentBank(items, N_SIGNAL, timbre_limit=1.0)
    b = bank.sample(jax.random.PRNGKey(3), 64)
    i0 = np.asarray(b["x"][:, 0, 0])
    i1 = np.asarray(b["x_cond"][:, 0, 0])
    assert (np.abs(i1 - i0) <= N_SIGNAL).all()
    # and without the window, far-apart crops occur
    bank2 = DeviceLatentBank(items, N_SIGNAL)
    b2 = bank2.sample(jax.random.PRNGKey(3), 64)
    d = np.abs(np.asarray(b2["x_cond"][:, 0, 0] - b2["x"][:, 0, 0]))
    assert d.max() > N_SIGNAL

def test_weights_respected():
    items = make_items(n=4, t=64)
    w = np.array([1.0, 0.0, 0.0, 0.0])
    bank = DeviceLatentBank(items, N_SIGNAL, weights=w)
    x = np.asarray(bank.sample(jax.random.PRNGKey(4), 32)["x"])
    rec = np.floor(x[:, 0, 0] / 1000).astype(int)
    assert (rec == 0).all()


def test_deterministic_given_key_and_iterator_advances():
    bank = DeviceLatentBank(make_items(), N_SIGNAL)
    a = bank.sample(jax.random.PRNGKey(7), 4)
    b = bank.sample(jax.random.PRNGKey(7), 4)
    np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
    it = bank.batches(4, seed=0)
    b1, b2 = next(it), next(it)
    assert not np.array_equal(np.asarray(b1["x"]), np.asarray(b2["x"]))


def test_ragged_record_lengths():
    items = make_items(n=2, t=40)
    items += make_items(n=2, t=17, seed=1, id0=2)   # exactly n_signal + 1
    bank = DeviceLatentBank(items, N_SIGNAL)
    x = np.asarray(bank.sample(jax.random.PRNGKey(5), 64)["x"])
    marks = x[..., 0]
    np.testing.assert_allclose(np.diff(marks, axis=1), 1.0, atol=1e-4)
    off = marks[:, 0] % 1000
    # short records may only yield offset 0 or 1
    rec = np.floor(marks[:, 0] / 1000).astype(int)
    assert (off[rec >= 2] <= 1).all()


def test_bf16_bank_storage():
    bank = DeviceLatentBank(make_items(), N_SIGNAL, bank_dtype=jnp.bfloat16)
    batch = bank.sample(jax.random.PRNGKey(0), 4)
    assert batch["x"].dtype == jnp.float32      # upcast at crop time
    assert bank.nbytes * 2 == DeviceLatentBank(
        make_items(), N_SIGNAL).nbytes


@pytest.mark.slow
def test_train_cli_data_on_device(tmp_path):
    """The CLI flag trains end-to-end from the resident bank."""
    from after_tpu.cli.main import main as cli_main
    rng = np.random.RandomState(0)
    db = tmp_path / "zdb"
    with RecordWriter(str(db)) as w:
        for i in range(8):
            ae = AudioExample()
            ae.put_array("z", rng.randn(8, 200).astype(np.float32))
            ae.put_array("z_aug_0", rng.randn(8, 200).astype(np.float32))
            ae.put_metadata({"name": f"rec{i}"})
            w.put(f"{i:08d}", ae.serialize())
    out = tmp_path / "runs"
    assert cli_main([
        "train", "--name", "dod", "--db_path", str(db),
        "--out_path", str(out), "--config", "tiny",
        "--batch_size", "2", "--max_steps", "2",
        "--data_on_device", "--augmentation_keys", "all",
        "--override", "denoiser.embed_dim=64",
        "--override", "denoiser.n_layers=1",
        "--override", "denoiser.noise_embed_dims=16",
        "--override", "denoiser.mlp_multiplier=2",
        "--override", "encoder.channels=[8,8,8,16]",
        "--override", "encoder_time.channels=[8,8,8,8,12]",
        "--override", "classifier.channels=[8,8,8,8,6]",
        "--override", "train.n_signal=32",
    ]) == 0
    metrics = (out / "dod" / "metrics.jsonl").read_text()
    assert "diffusion_loss" in metrics or "loss" in metrics
