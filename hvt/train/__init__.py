"""Training layer: the jit-compiled train step is a first-class citizen here
(the reference delegates its loop to Composer's Trainer, reference
main.py:104-131; SURVEY.md §1 'Key architectural fact')."""
