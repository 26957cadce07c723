"""empty vutils: never called with --no_train_gen."""
