"""Semi-implicit Euler integrator with damping.

Order of operations matches the reference exactly (reference
``nbody/simulation.py:281-305`` — labelled "leapfrog" there, but the actual
update is kick → damp → drift):

    v += a * dt
    v *= damping          (1.0 = pure Newtonian, applied every substep)
    x += v * dt

Bodies are unbounded ("no boundaries, bodies can escape", reference
``simulation.py:303``).
"""

from __future__ import annotations



def integrate(pos, vel, accel, dt, damping=1.0):
    """One kick-damp-drift substep.

    Args:
      pos, vel, accel: ``(3, N)`` float32 arrays (component-major SoA — the
        TPU-friendly layout; lanes run along bodies).
      dt: scalar timestep.
      damping: velocity retention multiplier per substep.

    Returns:
      (new_pos, new_vel)
    """
    vel = (vel + accel * dt) * damping
    pos = pos + vel * dt
    return pos, vel
