"""CLI argument validation that must fail fast (no backend, no data).

The --stage_ndepths preset surface guards the cost-reg UNet's depth-stride
constraint (three 2x strides -> counts must be multiples of 8, like the
reference's (48, 32, 8)); a bad preset must exit with a clear message
before any compile or data touch.
"""

import pytest

from cds_mvsnet_tpu.cli.test_cli import main


@pytest.mark.parametrize("bad", ["24,16,4", "32,16", "7,16,8"])
def test_stage_ndepths_rejected_fast(tmp_path, bad):
    with pytest.raises(SystemExit) as e:
        main([
            "--dataset", "general", "--testpath", str(tmp_path),
            "--resume", str(tmp_path / "none.npz"),
            "--stage_ndepths", bad, "--skip_inference", "--filter_method", "none",
        ])
    assert "stage_ndepths" in str(e.value)
