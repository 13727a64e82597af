"""Analytics / dataset command-line tooling.

Equivalents of the reference's scripts/ utilities (SURVEY.md §2.9):
tokenize_steps, ngrams, print_assignments, convert_weights,
build_trajectory_training_dataset.
"""
