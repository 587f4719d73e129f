"""Model zoo: the mood CNN (reference C14's Keras model, rebuilt in Flax)."""
