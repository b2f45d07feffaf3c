"""Filled in after milestone 1."""
