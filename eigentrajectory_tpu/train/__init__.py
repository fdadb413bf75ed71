from .trainer import ETJaxTrainer
