from eeyore_tpu.linalg.pd import is_pos_def, nearest_pd
