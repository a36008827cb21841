"""Training: optimizer routing, LR/BN schedules, jitted train step, solver."""
