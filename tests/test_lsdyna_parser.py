"""LS-DYNA parser on a synthetic dump in the reference's text format."""

import numpy as np

from sgnn_tpu.data.lsdyna_parser import convert_to_npz, parse_simulation


def make_dump(path, n_particles=8, n_steps=3):
    """Emit a minimal LS-DYNA-style text dump (same sentinels as the
    reference parser expects)."""
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, size=(n_steps, n_particles, 2))
    eps = rng.uniform(0, 0.5, size=(n_steps, n_particles))
    lines = []
    for t in range(n_steps):
        lines.append("*NODE")
        for i in range(n_particles):
            lines.append(f" {i+1}, {pos[t,i,0]:.6e}, {pos[t,i,1]:.6e}, 0.0")
        lines.append("$NODAL_RESULTS")
    for t in range(n_steps):
        lines.append("$RESULT OF Effective Plastic Strain")
        for i in range(n_particles):
            lines.append(f" {i+1}, {eps[t,i]:.6e}")
        lines.append("*END")
    path.write_text("\n".join(lines) + "\n")
    return pos, eps


def test_parse_simulation(tmp_path):
    f = tmp_path / "C_80_320_case.txt"  # known case key -> type table applies
    pos, eps = make_dump(f)
    traj, types, strains = parse_simulation(f)
    assert traj.shape == (3, 8, 2)
    assert strains.shape == (3, 8)
    np.testing.assert_allclose(traj, pos, rtol=1e-5)
    np.testing.assert_allclose(strains, eps, rtol=1e-5)
    # ids 1..8 fall in the 'concrete' range of C_80_320 -> type 0
    assert (types == 0).all()


def test_unknown_case_defaults_to_type_zero(tmp_path):
    f = tmp_path / "X_unknown_case.txt"
    make_dump(f, n_particles=4)
    _, types, _ = parse_simulation(f)
    assert (types == 0).all() and len(types) == 4


def test_convert_to_npz_roundtrip(tmp_path):
    f = tmp_path / "C_80_320_case.txt"
    pos, eps = make_dump(f)
    out = convert_to_npz(f, tmp_path / "raw" / "case.npz")
    with np.load(out) as data:
        np.testing.assert_allclose(data["positions"], pos, rtol=1e-5)
        assert data["strains"].shape == (3, 8)
        assert data["particle_types"].dtype == np.int64
