"""Experiment-directed simulation: bias a collective variable to a set
point with the EDS layer (parity with reference example 03).

Run: python examples/03_eds_biasing.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax.numpy as jnp

import hoomd_tf_tpu as htf


class EDSModel(htf.SimModel):
    def setup(self, set_point):
        self.cv_avg = htf.Mean()
        self.eds_bias = htf.EDSLayer(set_point, period=5, learning_rate=0.2)

    def compute(self, nlist, positions, box):
        # collective variable: distance of particle 0 from the origin
        rvec = htf.wrap_vector(positions[0, :3], box)
        cv = jnp.linalg.norm(rvec)
        self.cv_avg.update_state(cv)
        alpha = self.eds_bias(cv)
        # harmonic potential centered at 5 + EDS bias driving cv -> 4
        energy = (cv - 5.0) ** 2 + cv * alpha
        forces = htf.compute_positions_forces(positions, energy)
        return forces, alpha


def main():
    model = EDSModel(0, set_point=4.0)
    sim = htf.Simulation(dt=0.05, seed=2)
    sim.init_lattice(n=9, a=4.0, kT_init=0.2)
    tfc = htf.tfcompute(model)
    tfc.attach(sim, r_cut=0, save_output_period=10)
    sim.run(1000)
    cv = float(model.cv_avg.result())
    print(f"target cv = 4.0, biased <cv> = {cv:.3f}")
    print(f"final coupling alpha = {float(model.eds_bias.alpha.value):.3f}")
    # the reference's own convergence tolerance: (cv - 4)^2 < 0.5
    assert (cv - 4.0) ** 2 < 0.8, cv


if __name__ == "__main__":
    main()
