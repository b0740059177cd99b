from .training import make_train_step, flow_match_loss
