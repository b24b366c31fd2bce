from .trainer import TrainResult, train_adam, trainable_mask
