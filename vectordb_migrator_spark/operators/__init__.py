"""Operator library — pure DataFrame -> DataFrame functions."""
