"""Hook lifecycle base (parity: `pointcept/engines/hooks/default.py`)."""


class HookBase:
    trainer = None  # weakref proxy set by TrainerBase.register_hooks

    def before_train(self):
        pass

    def before_epoch(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass

    def after_epoch(self):
        pass

    def after_train(self):
        pass
