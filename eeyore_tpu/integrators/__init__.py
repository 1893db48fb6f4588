from eeyore_tpu.integrators.mc import Integrator, MCIntegrator
