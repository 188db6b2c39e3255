package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level tag for the wall-time-heavy suites (SLT replay, the
 * generated-corpus scale benches, the real streaming specs) so a
 * quick pass can exclude them: {@code sbt "testOnly * -- -l graft.Slow"}.
 * The full `sbt test` budget is recorded in SURVEY section 8.5.
 */
@TagAnnotation
@Inherited
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.TYPE})
public @interface Slow {}
